"""Attention ops with a TPU Pallas flash path and an XLA reference path.

All model attention routes through :func:`dot_product_attention` so the
Pallas flash kernel (ops/flash_attention.py) can be swapped in globally.
The XLA path is fully fused by the compiler for the short sequences the
QA models see (<= a few hundred tokens); the flash path matters for
frames x patches sequences (e.g. 16 frames x 197 patches ~ 3.2k tokens,
reference config 5 in /root/repo/BASELINE.json).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive-mask value, safe in bf16 (finfo.min overflows sums)

_FLASH_MIN_SEQ = 512  # below this XLA's fused attention wins


def _use_flash(q_len: int, kv_len: int, explicit: Optional[bool]) -> bool:
    if explicit is not None:
        return explicit
    if q_len < _FLASH_MIN_SEQ or kv_len < _FLASH_MIN_SEQ:
        return False
    return jax.default_backend() == "tpu"


def dot_product_attention(
    q: jax.Array,  # (B, Hn, Lq, Dh)
    k: jax.Array,  # (B, Hn, Lk, Dh)
    v: jax.Array,  # (B, Hn, Lk, Dh)
    bias: Optional[jax.Array] = None,  # additive, broadcastable to (B, Hn, Lq, Lk)
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Scaled dot-product attention, (B, Hn, Lq, Dh) layout.

    Softmax accumulates in f32 regardless of input dtype (bf16-safe).
    """
    if _use_flash(q.shape[-2], k.shape[-2], use_flash):
        from sasvqa_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias)
    return _xla_attention(q, k, v, bias)


def _xla_attention(q, k, v, bias=None):
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


def padding_bias(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, Lk) 1/0 mask -> additive bias (B, 1, 1, Lk)."""
    return ((1.0 - attention_mask.astype(jnp.float32))
            * NEG_INF)[:, None, None, :].astype(dtype)


def causal_bias(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """(1, 1, L, L) additive causal bias (upper triangle masked)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j > i, NEG_INF, 0.0)[None, None].astype(dtype)
