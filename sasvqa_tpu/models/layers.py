"""Shared Flax transformer building blocks.

Covers both layer conventions used by the model families:

- pre-LN blocks (CLIP text/vision, BLIP vision, GIT vision) —
  ``h += attn(LN(h)); h += mlp(LN(h))``
- post-LN / BERT blocks (GIT text encoder, BLIP text) —
  ``h = LN(h + attn(h)); h = LN(h + ffn(h))``

Parameter layout intentionally mirrors the HF module names (q_proj /
k_proj / v_proj / out_proj, fc1 / fc2, ...) so the HF->Flax weight
converter (models/convert.py) is a mechanical rename.

Attention-probability dropout: the blocks in THIS module apply dropout
only after the output projection — which matches every HF family that
trains here except GIT (CLIP/BLIP default attention_probs_dropout_prob
to 0.0).  The GIT text stack, the one reference path that trains with
softmax-weight dropout 0.1, implements it via the coordinate-hash mask
in ``ops/git_flash`` (regenerated inside the recompute-in-backward
flash kernels; same hash on the dense path) — see ``models/git.py`` and
PARITY.md divergence #8 (retired r4).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.ops.attention import dot_product_attention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# HF key semantics: "gelu"/"gelu_python" are EXACT erf GELU; only the
# _new/_pytorch_tanh variants are the tanh approximation.  flax
# nn.gelu defaults to approximate=True, so the exact keys must override
# it — mapping them to the default drifts ~4e-4 per activation vs the
# ported HF weights' reference semantics, compounding over 6-12 layers
# (the f32 HF-parity tests hold at 4x tighter tolerances with erf).
def _gelu_exact(x):
    """erf GELU in f32; tanh form for sub-f32 compute dtypes.

    The tanh approximation's max error (4.7e-4 abs, measured) is ~8x
    below bf16 resolution (eps 3.9e-3): in bf16 the two forms differ by
    at most 1 ULP, inside matmul-accumulation noise — while XLA's erf
    costs ~14 ms/step more than tanh on the v5e flagship config.  Exact
    erf is kept wherever the dtype can represent the difference."""
    if jnp.dtype(x.dtype).itemsize < 4:
        return nn.gelu(x, approximate=True)
    return nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": _gelu_exact,
    "gelu_new": nn.gelu,
    "quick_gelu": quick_gelu,
    "relu": nn.relu,
    "gelu_python": _gelu_exact,
    "gelu_pytorch_tanh": nn.gelu,
}


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, D) -> (B, H, L, Dh)"""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, Dh) -> (B, L, D)"""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections.

    ``kv_states`` enables cross-attention (keys/values from a different
    sequence).  ``bias`` is an additive attention bias broadcastable to
    (B, H, Lq, Lk).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 kv_states: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 use_flash: Optional[bool] = None) -> jax.Array:
        d = hidden.shape[-1]
        kv = hidden if kv_states is None else kv_states
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = split_heads(dense("q_proj")(hidden), self.num_heads)
        k = split_heads(dense("k_proj")(kv), self.num_heads)
        v = split_heads(dense("v_proj")(kv), self.num_heads)
        out = dot_product_attention(q, k, v, bias=bias, use_flash=use_flash)
        return dense("out_proj")(merge_heads(out))


class FusedSelfAttention(nn.Module):
    """Self-attention with one fused (D, 3D) QKV projection.

    TPU motivation: three separate (seq, D)@(D, D) matmuls run the MXU
    at a fraction of its rate for D=768 (measured ~13 TF/s each on v5e)
    while a single (seq, D)@(D, 3D) reaches ~30 TF/s.  Used by the
    pre-LN encoder blocks — the vision towers are the FLOPs bulk.
    Converter note: HF q/k/v kernels concatenate on the output axis in
    q,k,v order (BLIP's vision attention is already stored fused).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 bias: Optional[jax.Array] = None,
                 use_flash: Optional[bool] = None) -> jax.Array:
        d = hidden.shape[-1]
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(hidden)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = dot_product_attention(
            split_heads(q, self.num_heads), split_heads(k, self.num_heads),
            split_heads(v, self.num_heads), bias=bias, use_flash=use_flash)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(
            merge_heads(out))


class MLP(nn.Module):
    """fc1 -> act -> fc2 (CLIP naming)."""

    intermediate_size: int
    activation: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = ACT2FN[self.activation](h)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class PreLNBlock(nn.Module):
    """CLIP-style encoder layer: LN -> attn -> +res ; LN -> MLP -> +res."""

    num_heads: int
    intermediate_size: int
    activation: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None,
                 use_flash: Optional[bool] = None) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + FusedSelfAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(
            ln("layer_norm1")(x), bias=bias, use_flash=use_flash)
        x = x + MLP(self.intermediate_size, self.activation,
                    dtype=self.dtype, name="mlp")(ln("layer_norm2")(x))
        return x


class BertSelfAttention(nn.Module):
    """BERT attention sub-block: MHA -> dense -> dropout -> +res -> LN.

    ``kv_states`` enables cross-attention (keys/values projected from a
    different sequence).  GIT's decode-time KV caching lives in
    models/git.GitAttention, not here.
    """

    num_heads: int
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def project_kv(self, hidden: jax.Array,
                   features: Optional[int] = None,
                   ) -> Tuple[jax.Array, jax.Array]:
        """K/V projections INTO ``features`` dims (default: the source's
        own width).  Cross-attention must pass the QUERY side's width:
        HF BertSelfAttention projects encoder states of any width into
        the text hidden size — using the encoder width here broke every
        config whose vision tower is wider than the text stack
        (blip-large 1024 vs 768; r3 review finding)."""
        d = features or hidden.shape[-1]
        k = split_heads(nn.Dense(d, dtype=self.dtype, name="key")(hidden),
                        self.num_heads)
        v = split_heads(nn.Dense(d, dtype=self.dtype, name="value")(hidden),
                        self.num_heads)
        return k, v

    @nn.compact
    def __call__(self, hidden: jax.Array,
                 bias: Optional[jax.Array] = None,
                 kv_states: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 use_flash: Optional[bool] = None) -> jax.Array:
        d = hidden.shape[-1]
        q = split_heads(nn.Dense(d, dtype=self.dtype, name="query")(hidden),
                        self.num_heads)
        kv_src = hidden if kv_states is None else kv_states
        k, v = self.project_kv(kv_src, features=d)
        ctx = merge_heads(dot_product_attention(q, k, v, bias=bias,
                                                use_flash=use_flash))
        out = nn.Dense(d, dtype=self.dtype, name="out_dense")(ctx)
        out = nn.Dropout(self.dropout_rate, deterministic=deterministic)(out)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="out_ln")(hidden + out)


class BertFFN(nn.Module):
    """BERT feed-forward sub-block: dense -> act -> dense -> +res -> LN."""

    intermediate_size: int
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = ACT2FN[self.activation](h)
        h = nn.Dense(d, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype,
                            name="ln")(x + h)


class PostLNBlock(nn.Module):
    """BERT-style encoder layer (GIT text encoder / BLIP text).

    ``cross_attention=True`` adds a cross-attention sub-block between
    self-attention and FFN (BLIP multimodal text encoder).
    """

    num_heads: int
    intermediate_size: int
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0
    cross_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 bias: Optional[jax.Array] = None,
                 encoder_hidden: Optional[jax.Array] = None,
                 encoder_bias: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 use_flash: Optional[bool] = None) -> jax.Array:
        x = BertSelfAttention(self.num_heads, self.layer_norm_eps,
                              self.dropout_rate, dtype=self.dtype,
                              name="attention")(
            x, bias=bias, deterministic=deterministic, use_flash=use_flash)
        if self.cross_attention:
            assert encoder_hidden is not None
            x = BertSelfAttention(self.num_heads, self.layer_norm_eps,
                                  self.dropout_rate, dtype=self.dtype,
                                  name="crossattention")(
                x, bias=encoder_bias, kv_states=encoder_hidden,
                deterministic=deterministic)
        return BertFFN(self.intermediate_size, self.activation,
                       self.layer_norm_eps, self.dropout_rate,
                       dtype=self.dtype, name="ffn")(
            x, deterministic=deterministic)


class PatchEmbed(nn.Module):
    """ViT patch embedding as an explicit unfold + matmul.

    Equivalent to the stride-p Conv2d the HF models use, but written as a
    reshape + Dense so XLA tiles it straight onto the MXU with no
    im2col materialisation.  Weights convert from the conv kernel by a
    transpose/reshape (see models/convert.py).
    Input is NHWC (TPU-native layout); callers convert from NCHW once at
    the host boundary.
    """

    patch_size: int
    embed_dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        b, h, w, c = pixels.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = pixels.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        return nn.Dense(self.embed_dim, use_bias=self.use_bias,
                        dtype=self.dtype, name="proj")(x)
