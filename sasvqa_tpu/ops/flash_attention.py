"""Pallas TPU flash attention (blockwise streaming softmax), fwd + bwd.

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

Backward is Pallas too (same dQ/dKV recurrences as ops/git_flash.py,
with the additive-bias block replacing the GIT metadata mask): the
forward saves per-row LSE, dQ runs one program per query block
streaming keys, dK/dV one program per key block streaming queries — no
O(L^2) transient.  The bias cotangent (live only if someone
differentiates w.r.t. the bias itself; every in-repo bias derives from
integer masks, so it is DCE'd) falls back to an XLA expression.
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

# Every program of every kernel here is independent (no revisited output
# blocks), so both grid dims carry "parallel" semantics — declares the
# true dependence structure to Mosaic's pipeliner.  Measured NEUTRAL on
# v5e (bench.py 61.1 vs 61.3 qa/s = noise; vitl16 1190.5 vs 1189.7),
# kept because it is free and correct.
_PARALLEL2 = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"))


def set_interpret_mode(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


# --------------------------------------------------------------------------
# forward


def _flash_core(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, bk: int,
                scale: float):
    """One (bh, q-block) program: stream K/V blocks with online softmax.

    q_ref: (1, BQ, Dh); k_ref/v_ref: (1, Lk, Dh); bias_ref: (1, BQ|1, Lk)
    or None; o_ref: (1, BQ, Dh); lse_ref: (1, 1, BQ) f32 or None (saved
    for the Pallas backward)."""
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
    # fully-masked rows (l == 0) emit zeros rather than NaN (reachable
    # only through an actual -inf bias; the repo's masks use the finite
    # NEG_INF, where softmax degrades to uniform exactly like XLA's)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / safe_l[:, None]).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0, :] = m + jnp.log(safe_l)


def _fwd_b(q, k, v, bias, o, *, bk, scale):
    _flash_core(q, k, v, bias, o, None, bk=bk, scale=scale)


def _fwd_n(q, k, v, o, *, bk, scale):
    _flash_core(q, k, v, None, o, None, bk=bk, scale=scale)


def _fwd_b_lse(q, k, v, bias, o, lse, *, bk, scale):
    _flash_core(q, k, v, bias, o, lse, bk=bk, scale=scale)


def _fwd_n_lse(q, k, v, o, lse, *, bk, scale):
    _flash_core(q, k, v, None, o, lse, bk=bk, scale=scale)


def _pad_to(x: jax.Array, axis: int, multiple: int,
            value: float = 0.0) -> jax.Array:
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


def _prep(q, k, v, bias, bq, bk):
    """Pad/flatten inputs and materialise the bias once; shared by the
    forward and both backward kernels."""
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
    dims = (b, h, lq, lk, lq_p, lk_p, dh)
    if bias is None:
        return qp, kp, vp, None, None, dims

    bb, bh_, blq, blk = bias.shape
    assert bb in (1, b) and bh_ in (1, h), (
        f"bias leading dims {(bb, bh_)} not broadcastable to {(b, h)}")
    # row-broadcast biases (blq == 1, e.g. key-padding masks) stay
    # O(Lk) — the kernels broadcast a (1, BK) slice over the q block;
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

    def bias_row(bh_i, bb=bb, bh_=bh_, h=h):
        batch_part = (bh_i // h) if bb != 1 else 0
        head_part = (bh_i % h) if bh_ != 1 else 0
        return batch_part * bh_ + head_part

    return qp, kp, vp, bias_f, (row_bias, bias_row), dims


def _qkv_specs(bq, lk_p, dh):
    return [
        pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, dh), lambda bh_i, qi: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, dh), lambda bh_i, qi: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _flash_forward(q, k, v, bias, bq: int, bk: int, want_lse: bool = False):
    qp, kp, vp, bias_f, bias_meta, dims = _prep(q, k, v, bias, bq, bk)
    b, h, lq, lk, lq_p, lk_p, dh = dims

    in_specs = _qkv_specs(bq, lk_p, dh)
    bias_arg = ()
    if bias_f is not None:
        row_bias, bias_row = bias_meta
        bias_arg = (bias_f,)
        in_specs.append(pl.BlockSpec(
            (1, 1 if row_bias else bq, lk_p),
            lambda bh_i, qi: (bias_row(bh_i), 0 if row_bias else qi, 0),
            memory_space=pltpu.VMEM))

    if want_lse:
        kernel = _fwd_b_lse if bias_arg else _fwd_n_lse
        out_shape = [jax.ShapeDtypeStruct((b * h, lq_p, dh), q.dtype),
                     jax.ShapeDtypeStruct((b * h, 1, lq_p), jnp.float32)]
        out_specs = [
            pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh_i, qi: (bh_i, 0, qi),
                         memory_space=pltpu.VMEM)]
    else:
        kernel = _fwd_b if bias_arg else _fwd_n
        out_shape = jax.ShapeDtypeStruct((b * h, lq_p, dh), q.dtype)
        out_specs = pl.BlockSpec((1, bq, dh),
                                 lambda bh_i, qi: (bh_i, qi, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(kernel, bk=bk, scale=dh ** -0.5),
        grid=(b * h, lq_p // bq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_p * lk_p * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p,
        ),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(qp, kp, vp, *bias_arg)
    if want_lse:
        o, lse = out
        return o.reshape(b, h, lq_p, dh)[:, :, :lq, :], lse
    return out.reshape(b, h, lq_p, dh)[:, :, :lq, :]


# --------------------------------------------------------------------------
# backward (Pallas: same recurrences as ops/git_flash.py with the bias
# block in place of the GIT metadata mask)


def _dq_core(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref, lse_ref,
             dq_ref, *, bk: int, scale: float):
    """grid = (B*H, nq): dQ for one query block, streaming key blocks."""
    q = q_ref[0].astype(jnp.float32)                   # (BQ, Dh)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :]                             # (BQ,)
    d_row = jnp.sum(do * o, axis=-1)                   # (BQ,)
    lk = k_ref.shape[1]

    def body(i, dq_acc):
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, :, pl.ds(i * bk, bk)].astype(jnp.float32)
        p = jnp.exp(s - lse[:, None])                  # (BQ, BK)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_row[:, None])
        return dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    dq = jax.lax.fori_loop(0, lk // bk, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dq_b(q, k, v, bias, do, o, lse, dq, *, bk, scale):
    _dq_core(q, k, v, bias, do, o, lse, dq, bk=bk, scale=scale)


def _dq_n(q, k, v, do, o, lse, dq, *, bk, scale):
    _dq_core(q, k, v, None, do, o, lse, dq, bk=bk, scale=scale)


def _dkv_core(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref, lse_ref,
              dk_ref, dv_ref, *, bq: int, scale: float, row_bias: bool):
    """grid = (B*H, nk): dK/dV for one key block, streaming q blocks."""
    k = k_ref[0].astype(jnp.float32)                   # (BK, Dh)
    v = v_ref[0].astype(jnp.float32)
    lq = q_ref.shape[1]
    bk = k.shape[0]

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        o = o_ref[0, pl.ds(i * bq, bq), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * bq, bq)]         # (BQ,)
        d_row = jnp.sum(do * o, axis=-1)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            blk = (bias_ref[0, :, :] if row_bias
                   else bias_ref[0, pl.ds(i * bq, bq), :])
            s = s + blk.astype(jnp.float32)
        p = jnp.exp(s - lse[:, None])                  # (BQ, BK)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BK, Dh)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - d_row[:, None])                 # (BQ, BK)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BK, Dh)
        return dk_acc, dv_acc

    z = jnp.zeros((bk, k.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, lq // bq, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dkv_b(q, k, v, bias, do, o, lse, dk, dv, *, bq, scale, row_bias):
    _dkv_core(q, k, v, bias, do, o, lse, dk, dv, bq=bq, scale=scale,
              row_bias=row_bias)


def _dkv_n(q, k, v, do, o, lse, dk, dv, *, bq, scale, row_bias):
    _dkv_core(q, k, v, None, do, o, lse, dk, dv, bq=bq, scale=scale,
              row_bias=row_bias)


def _flash_backward(q, k, v, bias, lse, out, g, bq: int, bk: int):
    qp, kp, vp, bias_f, bias_meta, dims = _prep(q, k, v, bias, bq, bk)
    b, h, lq, lk, lq_p, lk_p, dh = dims
    op = _pad_to(out, 2, bq).reshape(b * h, lq_p, dh)
    gp = _pad_to(g, 2, bq).reshape(b * h, lq_p, dh)
    scale = dh ** -0.5
    row_bias, bias_row = bias_meta if bias_f is not None else (False, None)

    # ---- dQ: one program per (bh, q block)
    dq_specs = _qkv_specs(bq, lk_p, dh)
    bias_arg = ()
    if bias_f is not None:
        bias_arg = (bias_f,)
        dq_specs.append(pl.BlockSpec(
            (1, 1 if row_bias else bq, lk_p),
            lambda bh_i, qi: (bias_row(bh_i), 0 if row_bias else qi, 0),
            memory_space=pltpu.VMEM))
    dq_specs += [
        pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                     memory_space=pltpu.VMEM),          # do
        pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                     memory_space=pltpu.VMEM),          # o
        pl.BlockSpec((1, 1, bq), lambda bh_i, qi: (bh_i, 0, qi),
                     memory_space=pltpu.VMEM),          # lse
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_b if bias_arg else _dq_n, bk=bk, scale=scale),
        grid=(b * h, lq_p // bq),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * lq_p * lk_p * dh,
            bytes_accessed=(qp.size * 3 + kp.size * 2) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(qp, kp, vp, *bias_arg, gp, op, lse)

    # ---- dK/dV: one program per (bh, key block); the full q/do/o/lse
    # stream stages per program (same O(Lq x Dh) VMEM class as forward)
    q_dim_p = 1 if row_bias else lq_p
    dkv_specs = [
        pl.BlockSpec((1, lq_p, dh), lambda bh_i, ki: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),          # q
        pl.BlockSpec((1, bk, dh), lambda bh_i, ki: (bh_i, ki, 0),
                     memory_space=pltpu.VMEM),          # k block
        pl.BlockSpec((1, bk, dh), lambda bh_i, ki: (bh_i, ki, 0),
                     memory_space=pltpu.VMEM),          # v block
    ]
    if bias_f is not None:
        dkv_specs.append(pl.BlockSpec(
            (1, q_dim_p, bk),
            lambda bh_i, ki: (bias_row(bh_i), 0, ki),
            memory_space=pltpu.VMEM))
    dkv_specs += [
        pl.BlockSpec((1, lq_p, dh), lambda bh_i, ki: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),          # do
        pl.BlockSpec((1, lq_p, dh), lambda bh_i, ki: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),          # o
        pl.BlockSpec((1, 1, lq_p), lambda bh_i, ki: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),          # lse
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_b if bias_arg else _dkv_n, bq=bq,
                          scale=scale, row_bias=row_bias),
        grid=(b * h, lk_p // bk),
        in_specs=dkv_specs,
        out_specs=[
            pl.BlockSpec((1, bk, dh), lambda bh_i, ki: (bh_i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), lambda bh_i, ki: (bh_i, ki, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b * h, lk_p, dh), k.dtype),
                   jax.ShapeDtypeStruct((b * h, lk_p, dh), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * lq_p * lk_p * dh,
            bytes_accessed=(qp.size * 3 + kp.size * 2) * qp.dtype.itemsize,
            transcendentals=b * h * lq_p * lk_p),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(qp, kp, vp, *bias_arg, gp, op, lse)

    dq = dq.reshape(b, h, lq_p, dh)[:, :, :lq, :]
    dk = dk.reshape(b, h, lk_p, dh)[:, :, :lk, :]
    dv = dv.reshape(b, h, lk_p, dh)[:, :, :lk, :]
    return dq, dk, dv


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
    out, lse = _flash_forward(q, k, v, bias, block_q, block_k,
                              want_lse=True)
    return out, (q, k, v, bias, lse, out)


def _bwd(block_q, block_k, res, g):
    q, k, v, bias, lse, out = res
    dq, dk, dv = _flash_backward(q, k, v, bias, lse, out, g,
                                 block_q, block_k)
    if bias is None:
        return dq, dk, dv, None
    # bias cotangent: every in-repo bias derives from integer masks, so
    # this O(L^2) XLA expression is dead code the compiler removes; it
    # stays for the exotic caller that differentiates a learned bias
    _, vjp = jax.vjp(lambda b_: _xla_reference(q, k, v, b_), bias)
    dbias, = vjp(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
