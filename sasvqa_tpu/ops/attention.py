"""Attention ops with a TPU Pallas flash path and an XLA reference path.

All model attention routes through :func:`dot_product_attention` so the
Pallas flash kernel (ops/flash_attention.py) can be swapped in globally.
The XLA path is fully fused by the compiler for the short sequences the
QA models see (<= a few hundred tokens); the flash path matters for
frames x patches sequences (e.g. 16 frames x 197 patches ~ 3.2k tokens,
reference config 5 in /root/repo/BASELINE.json).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive-mask value, safe in bf16 (finfo.min overflows sums)

_FLASH_MIN_SEQ = 512  # below this XLA's fused attention wins


def flash_backend_ok() -> bool:
    """True when compiled Pallas TPU kernels can run.

    jax.default_backend() alone is WRONG here: on runtimes whose TPU
    plugin ignores JAX_PLATFORMS (the axon tunnel), computation is
    CPU-forced via jax.config.jax_default_device while the default
    *backend* still reports 'tpu' — compiled Pallas then fails with
    'Only interpret mode is supported on CPU backend'.  Honor the
    default-device override first."""
    dd = jax.config.jax_default_device
    if dd is not None:
        # jax also accepts a plain platform STRING here ("cpu"), which
        # has no .platform attribute
        return getattr(dd, "platform", dd) == "tpu"
    return jax.default_backend() == "tpu"


def _use_flash(q_len: int, kv_len: int, explicit: Optional[bool]) -> bool:
    if explicit is not None:
        return explicit
    if q_len < _FLASH_MIN_SEQ or kv_len < _FLASH_MIN_SEQ:
        return False
    return flash_backend_ok()


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
        if bias is not None:
            # flash blocks index bias by rank-4 position; lower-rank
            # biases (fine for the XLA path's broadcasting) must gain
            # leading axes or the kernel path crashes only once the
            # sequence grows past the flash threshold
            while bias.ndim < 4:
                bias = bias[None]
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
