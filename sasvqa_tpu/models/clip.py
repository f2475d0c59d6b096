"""Flax CLIP text + vision encoders (TPU-native rebuild).

Functional parity targets (verified by tests/test_hf_parity.py against
the installed HF PyTorch implementation):

- text tower  = HF ``CLIPTextModel``: token+pos embeddings, pre-LN
  encoder with causal + padding mask, final LN, pooled at the EOS
  position (reference usage: src/modeling/modeling.py:286,295).
- vision tower = HF ``CLIPVisionModelWithProjection``: patch embed,
  class token, pre-LN encoder; ``last_hidden_state`` is NOT post-LN'd,
  the pooled CLS is post-LN'd then projected (no bias) to
  ``image_embeds`` (reference usage: src/modeling/modeling.py:287,296,
  consumed at :424 as the per-frame embedding).

Pixel input layout is NHWC (TPU-native); the data pipeline converts
from stored CHW once on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.layers import PreLNBlock, PatchEmbed
from sasvqa_tpu.ops.attention import causal_bias, padding_bias


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


# presets mirroring the reference's supported checkpoints
CLIP_VIT_B32 = (CLIPTextConfig(), CLIPVisionConfig(patch_size=32))
CLIP_VIT_B16 = (CLIPTextConfig(), CLIPVisionConfig(patch_size=16))
CLIP_VIT_L14 = (
    CLIPTextConfig(hidden_size=768, intermediate_size=3072, num_layers=12,
                   num_heads=12),
    CLIPVisionConfig(hidden_size=1024, intermediate_size=4096, num_layers=24,
                     num_heads=16, patch_size=14, projection_dim=768),
)


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    # with_projection adds the CLIP text_projection (no bias) so the
    # pooled output lives in the shared text/image embedding space
    # (HF CLIPTextModelWithProjection) — needed for retrieval
    with_projection: bool = False
    projection_dim: int = 512

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 ) -> Tuple[jax.Array, jax.Array]:
        """Returns (last_hidden_state (B, L, D), pooled (B, D)); pooled
        is projected to the shared space when with_projection."""
        cfg = self.config
        b, l = input_ids.shape
        # trace-time guard: JAX clamps out-of-bounds embedding gathers
        # under jit, so max_txt_len > max_position_embeddings (77 for
        # CLIP) would silently reuse the last position embedding for
        # every extra token instead of erroring like HF (r3 review
        # finding).  l is a static shape — this costs nothing compiled.
        assert l <= cfg.max_position_embeddings, (
            f"text length {l} exceeds max_position_embeddings "
            f"{cfg.max_position_embeddings} — lower --max_txt_len")
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embedding")(
            jnp.arange(l)[None, :])
        x = tok + pos

        bias = causal_bias(l, dtype=self.dtype)
        if attention_mask is not None:
            bias = bias + padding_bias(attention_mask, dtype=self.dtype)

        for i in range(cfg.num_layers):
            x = PreLNBlock(cfg.num_heads, cfg.intermediate_size,
                           cfg.hidden_act, cfg.layer_norm_eps,
                           dtype=self.dtype, name=f"layers_{i}")(x, bias=bias)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        # pool at the EOS token position (HF: first eos_token_id match)
        is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
        eos_pos = jnp.argmax(is_eos, axis=-1)
        # sequences with no EOS fall back to the last position
        eos_pos = jnp.where(is_eos.sum(-1) > 0, eos_pos, l - 1)
        pooled = jnp.take_along_axis(
            x, eos_pos[:, None, None].repeat(x.shape[-1], axis=-1), axis=1
        )[:, 0]
        if self.with_projection:
            pooled = nn.Dense(self.projection_dim, use_bias=False,
                              dtype=self.dtype,
                              name="text_projection")(pooled)
        return x, pooled


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    # GIT's vision tower post-LNs every token; plain CLIP only the CLS
    post_ln_all_tokens: bool = False
    with_projection: bool = True
    # rematerialise each block in backward (ViT-L / many-frame configs
    # trade ~30% FLOPs for O(layers) activation memory)
    remat: bool = False
    # optional jax.checkpoint_policies name (e.g. "dots_saveable",
    # "dots_with_no_batch_dims_saveable"): lets remat SAVE selected
    # intermediates instead of recomputing the whole block — less
    # recompute, more residual memory.  None = recompute everything.
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(self, pixels: jax.Array,
                 ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        """pixels: (N, H, W, C) NHWC.

        Returns (last_hidden_state (N, P+1, D), pooled_cls (N, D),
        image_embeds (N, proj) or None).
        """
        cfg = self.config
        n = pixels.shape[0]
        patches = PatchEmbed(cfg.patch_size, cfg.hidden_size,
                             use_bias=False, dtype=self.dtype,
                             name="patch_embedding")(pixels)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,)).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, cfg.hidden_size)), patches], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(num_pos, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(
            jnp.arange(x.shape[1])[None, :])
        x = x + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        if self.remat:
            policy = (getattr(jax.checkpoint_policies, self.remat_policy)
                      if self.remat_policy else None)
            block_cls = nn.remat(PreLNBlock, policy=policy)
        else:
            block_cls = PreLNBlock
        for i in range(cfg.num_layers):
            x = block_cls(cfg.num_heads, cfg.intermediate_size,
                          cfg.hidden_act, cfg.layer_norm_eps,
                          dtype=self.dtype, name=f"layers_{i}")(x)
        post_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name="post_layernorm")
        if self.post_ln_all_tokens:
            x = post_ln(x)
            pooled = x[:, 0]
        else:
            pooled = post_ln(x[:, 0])
        image_embeds = None
        if self.with_projection:
            image_embeds = nn.Dense(cfg.projection_dim, use_bias=False,
                                    dtype=self.dtype,
                                    name="visual_projection")(pooled)
        return x, pooled, image_embeds
