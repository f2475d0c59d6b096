"""Cross-attention fusion head + answer classifier (CLIP/BLIP path).

Functional rebuild of the reference's ``CrossAttentionLayer`` +
``CLIPForSeqClassification`` head (src/modeling/modeling.py:351-448):

- ``dec-only`` variant = one torch ``TransformerDecoderLayer``
  (post-LN, ReLU, d_ff = 4*d, nhead=8, batch_first) applied with the
  text as the target and the per-video frame embeddings as memory,
  with the text padding mask on self-attention keys.
- a zero "decoded token" is prepended to the text hidden states and the
  classifier reads position 0 (modeling.py:427-447).

The ragged ``video_start_end`` slicing of the reference (modeling.py:
432-441) is replaced by a fixed-shape (B, T, D) frame-embedding tensor:
every video in a batch contributes exactly ``nframe`` frames, which is
what the live collators produce anyway (``video_lengths = [L]*B``,
dataset_video_qa.py:220-224).  This keeps shapes static under jit.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.layers import MultiHeadAttention
from sasvqa_tpu.ops.attention import NEG_INF


class TransformerDecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer equivalent (post-LN, batch_first).

    self-attn -> +res -> LN1 ; cross-attn -> +res -> LN2 ;
    FFN(act) -> +res -> LN3.
    """

    num_heads: int = 8
    ffn_scale: int = 4
    activation: str = "relu"
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jax.Array, memory: jax.Array,
                 tgt_key_padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        d = tgt.shape[-1]
        ln = lambda name: nn.LayerNorm(dtype=self.dtype, name=name)
        drop = lambda: nn.Dropout(self.dropout_rate,
                                  deterministic=deterministic)
        bias = None
        if tgt_key_padding_mask is not None:
            # 1 = valid (we invert the torch convention at the call site)
            bias = ((1.0 - tgt_key_padding_mask.astype(jnp.float32))
                    * NEG_INF)[:, None, None, :].astype(self.dtype)
        x = ln("norm1")(tgt + drop()(MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="self_attn")(
            tgt, bias=bias)))
        x = ln("norm2")(x + drop()(MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="cross_attn")(
            x, kv_states=memory)))
        act = nn.relu if self.activation == "relu" else nn.gelu
        h = nn.Dense(self.ffn_scale * d, dtype=self.dtype, name="linear1")(x)
        h = nn.Dense(d, dtype=self.dtype, name="linear2")(
            drop()(act(h)))
        return ln("norm3")(x + drop()(h))


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer equivalent (post-LN)."""

    num_heads: int = 8
    ffn_scale: int = 4
    activation: str = "gelu"
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        drop = lambda: nn.Dropout(self.dropout_rate,
                                  deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            x + drop()(MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                          name="self_attn")(x)))
        act = nn.relu if self.activation == "relu" else nn.gelu
        h = nn.Dense(self.ffn_scale * d, dtype=self.dtype,
                     name="linear1")(x)
        h = nn.Dense(d, dtype=self.dtype, name="linear2")(drop()(act(h)))
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + drop()(h))


class CrossAttentionFusion(nn.Module):
    """The reference CrossAttentionLayer's three variants
    (modeling.py:351-390):

    - ``dec-only`` (the live default): n_layer stacked decoder layers,
      text as target, frame embeddings as memory;
    - ``enc-dec``: one encoder layer over the frames then one decoder
      layer (torch.nn.Transformer(1, 1, gelu) semantics incl. the final
      encoder/decoder LayerNorms);
    - ``dec-cas``: the shared decoder layer applied per frame in a
      cascade (memory = one frame at a time).
    """

    num_heads: int = 8
    n_layers: int = 1
    dropout_rate: float = 0.1
    attn_type: str = "dec-only"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt_in: jax.Array, vis_in: jax.Array,
                 txt_attn_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        if self.attn_type == "enc-dec":
            mem = TransformerEncoderLayer(
                self.num_heads, activation="gelu",
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name="encoder_0")(vis_in, deterministic=deterministic)
            mem = nn.LayerNorm(dtype=self.dtype, name="encoder_norm")(mem)
            # reference passes vis as src and txt as tgt (modeling.py:378)
            out = TransformerDecoderLayer(
                self.num_heads, activation="gelu",
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name="decoder_0")(txt_in, mem,
                                  tgt_key_padding_mask=txt_attn_mask,
                                  deterministic=deterministic)
            return nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(out)

        if self.attn_type == "dec-cas":
            # one shared decoder layer cascaded over frames
            # (modeling.py:382-390)
            layer = TransformerDecoderLayer(
                self.num_heads, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name="layers_0")
            o = txt_in
            for t in range(vis_in.shape[1]):
                o = layer(o, vis_in[:, t:t + 1],
                          tgt_key_padding_mask=txt_attn_mask,
                          deterministic=deterministic)
            return o

        assert self.attn_type == "dec-only", self.attn_type
        x = txt_in
        for i in range(self.n_layers):
            x = TransformerDecoderLayer(
                self.num_heads, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name=f"layers_{i}")(
                x, vis_in, tgt_key_padding_mask=txt_attn_mask,
                deterministic=deterministic)
        return x


class AnswerClassifier(nn.Module):
    """Zero decoded-token + fusion + linear classifier at position 0.

    Inputs: text hidden states (B, L, D) + mask (B, L), frame embeddings
    (B, T, D).  Mirrors CLIPForSeqClassification.forward:427-448.
    """

    num_labels: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    classifier: str = "linear"  # live reference path uses a single Linear
    cls_hidden_scale: int = 2
    attn_type: str = "dec-only"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, txt_hidden: jax.Array, txt_mask: jax.Array,
                 vis_embeds: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        b, l, d = txt_hidden.shape
        zero_tok = jnp.zeros((b, 1, d), dtype=txt_hidden.dtype)
        txt_in = jnp.concatenate([zero_tok, txt_hidden], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((b, 1), dtype=txt_mask.dtype), txt_mask], axis=1)
        fused = CrossAttentionFusion(
            self.num_heads, dropout_rate=self.dropout_rate,
            attn_type=self.attn_type, dtype=self.dtype,
            name="attention")(txt_in, vis_embeds, mask,
                              deterministic=deterministic)
        pooled = fused[:, 0, :]
        if self.classifier == "mlp":
            h = nn.Dense(d * self.cls_hidden_scale, dtype=self.dtype,
                         name="cls_fc")(pooled)
            pooled = nn.gelu(h)
        return nn.Dense(self.num_labels, dtype=self.dtype,
                        name="classifier")(pooled).astype(jnp.float32)
