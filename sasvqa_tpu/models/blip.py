"""Flax BLIP vision + multimodal text encoder.

Rebuild of the reference BLIP path (src/modeling/modeling.py:299-315
``BLIPBaseModel``): BlipVisionModel encodes frames; BlipTextModel runs a
BERT-style encoder whose layers cross-attend to the vision hidden
states.  The pooled outputs feed the same AnswerClassifier fusion head
as CLIP (modeling.py:402-404 routes 'blip' through
CLIPForSeqClassification).

HF quirks replicated for weight parity:
- vision ``pooler_output`` applies post_layernorm *twice* to the CLS
  token (HF BlipVisionModel.forward post-LNs the sequence, then the
  pooled slice again);
- text pooler = dense + tanh over position 0.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sasvqa_tpu.models.layers import PostLNBlock, PatchEmbed
from sasvqa_tpu.ops.attention import padding_bias


@dataclasses.dataclass(frozen=True)
class BLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 384
    patch_size: int = 16
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"


@dataclasses.dataclass(frozen=True)
class BLIPTextConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    dropout: float = 0.0
    encoder_width: int = 768  # vision hidden size for cross-attention


class BLIPVisionEncoder(nn.Module):
    """BLIP ViT: patch embed (with bias), CLS, learned pos table, pre-LN
    blocks, post-LN over all tokens."""

    config: BLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        from sasvqa_tpu.models.layers import PreLNBlock
        cfg = self.config
        n = pixels.shape[0]
        patches = PatchEmbed(cfg.patch_size, cfg.hidden_size, use_bias=True,
                             dtype=self.dtype, name="patch_embedding")(pixels)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden_size)).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, cfg.hidden_size)), patches], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, num_pos, cfg.hidden_size)).astype(self.dtype)
        x = x + pos[:, :x.shape[1]]
        for i in range(cfg.num_layers):
            x = PreLNBlock(cfg.num_heads, cfg.intermediate_size,
                           cfg.hidden_act, cfg.layer_norm_eps,
                           dtype=self.dtype, name=f"layers_{i}")(x)
        post_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name="post_layernorm")
        x = post_ln(x)
        pooled = post_ln(x[:, 0])  # double post-LN, matches HF
        return x, pooled


class BLIPTextEncoder(nn.Module):
    """BERT-style text encoder with per-layer cross-attention to vision."""

    config: BLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array,
                 encoder_hidden: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        b, l = input_ids.shape
        # trace-time guard (see models/clip.py): JAX clamps OOB
        # embedding gathers under jit instead of erroring like HF
        assert l <= cfg.max_position_embeddings, (
            f"text length {l} exceeds max_position_embeddings "
            f"{cfg.max_position_embeddings}")
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(
            jnp.arange(l)[None, :])
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="emb_ln")(tok + pos)
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)
        bias = padding_bias(attention_mask, dtype=self.dtype)
        for i in range(cfg.num_layers):
            x = PostLNBlock(cfg.num_heads, cfg.intermediate_size,
                            cfg.hidden_act, cfg.layer_norm_eps, cfg.dropout,
                            cross_attention=encoder_hidden is not None,
                            dtype=self.dtype, name=f"layers_{i}")(
                x, bias=bias, encoder_hidden=encoder_hidden,
                deterministic=deterministic)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size, dtype=self.dtype,
                                  name="pooler")(x[:, 0]))
        return x, pooled
