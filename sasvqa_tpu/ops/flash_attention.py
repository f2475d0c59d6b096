"""Pallas TPU flash attention (blockwise streaming softmax).

The long axis in this framework is frames x patches (e.g. 16 frames x
197 patches ~ 3.2k tokens for the ViT-L 16-frame config, BASELINE.json
config 5; 8-frame GIT-base trains at ~1.6k).  The XLA fallback
materialises the (Lq, Lk) score matrix in HBM; this kernel keeps the
softmax TEMPORARIES at O(BQ x BK) via the online recurrence (no
(Lq, Lk) score matrix ever exists), while each program stages the full
padded K/V (O(Lk x Dh)) — and, for a per-example bias, a (BQ, Lk) f32
bias block — in VMEM.  That bias block is the VMEM ceiling: ~13 MB at
Lk~6.4k, near v5e's 16 MB.  Sequences beyond that need the metadata-mask
variant (ops/git_flash.py reconstructs the mask from O(B*S) data
in-kernel) rather than a materialised bias.
(SURVEY.md §5.7: blockwise kernel instead of multi-chip CP.)

Forward runs in Pallas; the backward pass uses an XLA recompute VJP
(correct, O(L^2) transient) — a Pallas backward kernel is future work.

Supports an additive bias broadcastable to (B, H, Lq, Lk) — the GIT
combined image/causal/padding mask arrives as (B, 1, S, S).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared mask constant — the XLA and flash paths must agree bit-for-bit
from sasvqa_tpu.ops.attention import NEG_INF

# 512-blocks run ~2x faster than 128 at kiloscale sequences on v5e
DEFAULT_BQ = 512
DEFAULT_BK = 512

# Pallas interpreter mode (for CPU correctness tests; the axon TPU plugin
# ignores JAX_PLATFORMS so backend sniffing is unreliable here).
_INTERPRET = False


def set_interpret_mode(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bk: int,
                  scale: float):
    """One (bh, q-block) program: stream K/V blocks with online softmax.

    q_ref: (1, BQ, Dh); k_ref/v_ref: (1, Lk, Dh); bias_ref: (1, BQ, Lk)
    or None; o_ref: (1, BQ, Dh).
    """
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, Dh)
    bq = q.shape[0]
    lk = k_ref.shape[1]
    nblocks = lk // bk

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)  # (BK, Dh)
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BQ, BK)
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(i * bk, bk)].astype(jnp.float32)
        m_blk = jnp.max(s, axis=-1)                    # (BQ,)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new[:, None])                # (BQ, BK)
        corr = jnp.exp(m - m_new)                      # (BQ,)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, acc0))
    # fully-masked rows (l == 0) emit zeros rather than NaN
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / safe_l[:, None]).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int,
            value: float = 0.0) -> jax.Array:
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


def _flash_forward(q, k, v, bias, bq: int, bk: int):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    lq_p = lq + ((-lq) % bq)
    lk_p = lk + ((-lk) % bk)

    qp = _pad_to(q, 2, bq).reshape(b * h, lq_p, dh)
    kp = _pad_to(k, 2, bk).reshape(b * h, lk_p, dh)
    vp = _pad_to(v, 2, bk).reshape(b * h, lk_p, dh)

    # padded keys must be masked; materialise/extend the bias if needed
    if bias is None and lk_p != lk:
        bias = jnp.zeros((1, 1, 1, lk), q.dtype)
    bias_arg = ()
    bias_spec = ()
    if bias is not None:
        bb, bh_, blq, blk = bias.shape
        assert bb in (1, b) and bh_ in (1, h), (
            f"bias leading dims {(bb, bh_)} not broadcastable to {(b, h)}")
        # row-broadcast biases (blq == 1, e.g. key-padding masks) stay
        # O(Lk) — the kernel broadcasts a (1, BK) slice over the q block;
        # only genuinely 2D biases materialise (Lq, Lk)
        row_bias = blq == 1
        q_dim = 1 if row_bias else lq
        bias_f = jnp.broadcast_to(bias, (bb, bh_, q_dim, lk))
        bias_f = _pad_to(bias_f, 3, bk, NEG_INF)
        if not row_bias:
            bias_f = _pad_to(bias_f, 2, bq)
        q_dim_p = 1 if row_bias else lq_p
        # collapse to (bb*bh_, q_dim_p, Lk_p); index by the ORIGINAL
        # leading dims so (1, H, ...) / (B, 1, ...) / (B, H, ...) /
        # (1, 1, ...) all resolve correctly even when H == B
        bias_f = bias_f.reshape(bb * bh_, q_dim_p, lk_p)

        def bias_index(bh_i, qi, bb=bb, bh_=bh_, h=h, row=row_bias):
            batch_part = (bh_i // h) if bb != 1 else 0
            head_part = (bh_i % h) if bh_ != 1 else 0
            return (batch_part * bh_ + head_part, 0 if row else qi, 0)

        bias_arg = (bias_f,)
        bias_spec = (pl.BlockSpec((1, 1 if row_bias else bq, lk_p),
                                  bias_index, memory_space=pltpu.VMEM),)

    grid = (b * h, lq_p // bq)
    kernel = functools.partial(
        _flash_kernel if bias_arg else _flash_kernel_nobias,
        bk=bk, scale=dh ** -0.5)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, dh), lambda bh_i, qi: (bh_i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, dh), lambda bh_i, qi: (bh_i, 0, 0),
                         memory_space=pltpu.VMEM),
            *bias_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp, *bias_arg)
    return out.reshape(b, h, lq_p, dh)[:, :, :lq, :]


def _flash_kernel_nobias(q_ref, k_ref, v_ref, o_ref, *, bk, scale):
    _flash_kernel(q_ref, k_ref, v_ref, None, o_ref, bk=bk, scale=scale)


def _xla_reference(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    block_q: int = DEFAULT_BQ,
                    block_k: int = DEFAULT_BK) -> jax.Array:
    """(B, H, Lq, Dh) x (B, H, Lk, Dh) -> (B, H, Lq, Dh)."""
    return _flash_forward(q, k, v, bias, block_q, block_k)


def _fwd(q, k, v, bias, block_q, block_k):
    out = _flash_forward(q, k, v, bias, block_q, block_k)
    return out, (q, k, v, bias)


def _bwd(block_q, block_k, res, g):
    # XLA recompute backward: correct O(L^2) transient; Pallas backward
    # kernel is future work.
    q, k, v, bias = res

    def f(q, k, v, bias):
        return _xla_reference(q, k, v, bias)

    if bias is None:
        _, vjp = jax.vjp(lambda a, b, c: f(a, b, c, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
