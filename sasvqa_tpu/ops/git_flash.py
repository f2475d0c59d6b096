"""GIT-mask-specialized Pallas flash attention — forward AND backward.

The GIT combined mask (image rows attend image cols only; text rows
attend image cols + causal text cols, minus text padding — HF
GitModel.create_attention_mask semantics) is a pure function of
(num_img, text padding mask).  The generic path materialises it as a
(B, 1, S, S) additive bias — 86 MB of HBM traffic per layer at
B=8, S=1640, and the XLA backward additionally materialises the
(B, H, S, S) probability matrix (~1 GB f32 per layer).  These kernels
reconstruct the mask from a (B, S) column-validity vector + index
arithmetic inside VMEM and run the standard flash recurrences:

- forward: online softmax, emits the output and the per-row logsumexp;
- backward (default, fused single pass): one kernel over key blocks
  whose inner loop over query blocks recomputes each (BQ, BK) score
  block ONCE and emits all three gradients — dK/dV accumulate locally,
  dQ accumulates across the key-block grid dimension through an output
  block whose index map ignores it (Mosaic keeps a revisited output
  block in VMEM, so the f32 read-modify-write is free until the row
  flushes).  ``dS = P * (dO V^T - rowsum(dO*O))``; no S x S tensor ever
  exists.  5 S^2-matmuls per block pair vs the split formulation's 7
  (a separate dQ pass re-runs QK^T and dO V^T), and the mask + exp
  VPU work runs once instead of twice — measured 1.13x on the 6-layer
  flagship-shape fwd+bwd with all three gradients live (65.9 -> 58.2
  ms; set ``FUSED_BWD = False`` for the split kernels).  CAUTION when
  re-measuring: if k/v are closed-over constants XLA dead-code-
  eliminates the split path's entire dKV kernel but cannot strip the
  fused kernel's dK/dV matmuls, which makes the split path look ~1.5x
  FASTER than fused on a dq-only probe while being 1.13x slower on the
  gradients training actually needs.

Mask arithmetic is all-f32 (Mosaic rejects i1 vector logic ops).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared mask constant — all three attention paths (XLA, generic flash,
# GIT flash) must agree bit-for-bit
from sasvqa_tpu.ops.attention import NEG_INF

# 512-blocks measured 2.1x faster than 128 at S=1640 on v5e (the MXU
# amortises better over bigger tiles; padding waste is within the win)
DEFAULT_BQ = 512
DEFAULT_BK = 1024

# candidate (bq, bk) pairs for the shape-aware chooser.  Constraints the
# current kernels impose: both x128 (bq: the (1,1,bq) LSE block minor;
# bk: in-kernel minor-dim colmask slice offsets), s_pad a multiple of
# both (grid / key-loop trip counts).  bq*bk is capped near 512*1024:
# the (bq,bk) f32 temporaries (s/p/dp/ds) live in VMEM (~16 MB/core).
_BLOCK_CANDIDATES = ((512, 1024), (896, 896), (768, 768), (640, 640),
                     (512, 512))
# NOTE: blocks below ~512x512 lose even when they pad less: at S=4144,
# (384,384) pads to 4224 vs (896,896)'s 4480 yet measures 5% SLOWER
# (1256 vs 1194 ms on the vitl16 config) — tile-size MXU/pipeline
# amortisation beats the padded-area model once tiles shrink.  Mixed
# pairs like (384,768)/(256,512) are dominated by their square lcm-mates
# and can never be chosen — keep the list to selectable entries only.


# Measured fused-vs-split cost ratio for the backward-inclusive step:
# at the vitl16 shape, fused 512x512 (s_pad 4608) 33.6 ms beats split
# 896x896 (s_pad 4480) 35.0 despite 6% more padded work -> the split
# formulation costs ~1.10x per padded element (it re-runs QK^T and
# dO V^T in a second pass; 7 S^2-matmuls vs fused's 5).
_SPLIT_BWD_PENALTY = 1.10


def _choose_blocks(s: int, dh: int = 64, fwd_only: bool = False,
                   rate: float = 0.0) -> Tuple[int, int]:
    """Pick (bq, bk) minimising estimated fwd+bwd cost for sequence s.

    Cost = padded work s_pad^2, scaled by _SPLIT_BWD_PENALTY when the
    pair's scoped-VMEM frontier forces the split backward — a smaller
    tile that keeps the FUSED backward can beat the padding-optimal
    tile that cannot (measured at the vitl16 shape: fused 512^2 > split
    896^2).  ``fwd_only`` (inference/eval) drops that weighting — with
    no backward, padding is the only cost.  Padding itself costs
    quadratically: at S=1608 the default (512,1024) pads to 2048 =
    1.62x the real S^2 work, while (896,896) pads to 1792 (1.24x) and
    measures ~15% faster end-to-end on the flagship step.  Ties prefer
    bigger tiles (MXU amortisation)."""
    best, best_cost = None, None
    for bq, bk in _BLOCK_CANDIDATES:
        l = math.lcm(bq, bk)
        s_pad = -(-s // l) * l
        penalty = 1.0 if fwd_only or _fused_eligible(s_pad, dh, bq, bk,
                                                     rate) \
            else _SPLIT_BWD_PENALTY
        cost = (s_pad * s_pad * penalty, -(bq * bk))
        if best_cost is None or cost < best_cost:
            best, best_cost = (bq, bk), cost
    return best

# Sequence threshold below which the XLA dense-recompute backward is
# used instead of the Pallas kernels.  With 512-blocks the Pallas
# backward wins at every measured size (47.2 vs 41.1 qa/s at S=1640 on
# v5e, and it avoids the dense path's O(B*H*S^2) f32 transients — 6.6
# GB/layer at S=4144), so the threshold is 0; kept as a knob in case a
# future shape regresses.
PALLAS_BWD_MIN_SEQ = 0

_INTERPRET = False

# Grid-dimension semantics for Mosaic's pipeliner.  Every program of the
# forward/dq/dkv kernels is independent -> both dims "parallel" (no
# cross-iteration dependence assumed, frees scheduling).  The FUSED
# backward accumulates dQ through an output block revisited across grid
# dim 1, which REQUIRES sequential ("arbitrary") semantics there — only
# dim 0 (b*h rows) is parallel.
_PARALLEL2 = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"))
_PARALLEL_ROWS_ONLY = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"))


def set_interpret_mode(on: bool) -> None:
    global _INTERPRET
    _INTERPRET = on


def _i32(x: int) -> jnp.ndarray:
    """uint32 literal -> wrapped int32 constant."""
    return jnp.int32(x - (1 << 32) if x >= (1 << 31) else x)


def _hash_keep(bh, rows, cols, seed, rate: float):
    """Attention-probability dropout factor {0, 1/(1-rate)} as f32.

    Counter-based (stateless) RNG: a lowbias32-style integer finalizer
    hashed on the ELEMENT's absolute (batch*head, row, col) coordinates
    plus a per-call seed.  Properties the design needs:

    - the forward and the (differently-blocked) backward kernels
      regenerate bit-identical masks from coordinates alone — no mask
      tensor is ever materialised in HBM (an S x S bf16 mask would add
      ~40 MB/layer-step of traffic at the flagship shape);
    - int32 mul/xor/shift wrap identically in Mosaic, XLA:TPU and
      XLA:CPU, so the XLA fallback path and interpret-mode tests
      reproduce the compiled kernels' masks exactly (pltpu.prng_* would
      be TPU-only AND tile-layout-dependent across block shapes).

    The reference trains through HF GitSelfAttention's dropout(0.1) on
    softmax probabilities (PARITY #8); this applies the same semantics:
    P_drop = mask * P / (1-rate) AFTER normalisation, so the flash
    recurrences keep l = rowsum(exp) unmasked.
    """
    h = (seed
         + bh * _i32(0x9E3779B9)          # golden-ratio per-(b,h) offset
         + rows * _i32(0x85EBCA6B)
         + cols * _i32(0xC2B2AE35))
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * _i32(0x7FEB352D)
    h = h ^ jax.lax.shift_right_logical(h, 15)
    h = h * _i32(0x846CA68B)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    r = h & jnp.int32(0x7FFFFFFF)         # 31 uniform bits
    thresh = jnp.int32(int(rate * (1 << 31)))
    inv_keep = jnp.float32(1.0 / (1.0 - rate))
    return jnp.where(r >= thresh, inv_keep, 0.0)


def _dropout_block(bh, qi_base, ki_base, shape, seed_ref, rate: float):
    """Kernel-side factor for one (BQ, BK) tile.

    ``bh`` (grid dim 0's program id) is hoisted to the kernel top level
    by every caller: pl.program_id inside a fori_loop body fails to
    lower in interpret mode (closed_call subjaxpr)."""
    rows = qi_base + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = ki_base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return _hash_keep(bh, rows, cols, seed_ref[0], rate)


def hash_dropout_factor(b: int, h: int, s: int, seed, rate: float):
    """(B, H, S, S) factor tensor from the SAME hash — the XLA fallback
    and the parity-test oracle for the in-kernel generation."""
    bh = jnp.arange(b * h, dtype=jnp.int32)[:, None, None]
    rows = jnp.arange(s, dtype=jnp.int32)[None, :, None]
    cols = jnp.arange(s, dtype=jnp.int32)[None, None, :]
    return _hash_keep(bh, rows, cols, seed, rate).reshape(b, h, s, s)


def dense_attention_with_hash_dropout(q, k, v, bias, seed, rate: float):
    """XLA dense attention applying the kernels' exact dropout mask —
    the non-Pallas training path (CPU tests, flash off), bitwise the
    same masking decisions as the flash kernels given the same seed."""
    b, h, s, dh = q.shape
    scale = dh ** -0.5
    s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s_ = s_ + bias.astype(jnp.float32)
    p = jax.nn.softmax(s_, axis=-1)
    p = p * hash_dropout_factor(b, h, s, seed, rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _mask_ok(rows, cols, cm, num_img):
    """f32 validity (BQ, BK): 1 = attendable."""
    col_img = jnp.where(cols < num_img, 1.0, 0.0)
    causal = jnp.where(cols <= rows, 1.0, 0.0)
    text_ok = jnp.maximum(col_img, causal * cm)
    return jnp.where(rows >= num_img, text_ok, col_img)


def _mask_block(s, qi_base, ki_base, colmask_ref, num_img):
    """Apply the GIT mask to one (BQ, BK) score block."""
    bq, bk = s.shape
    rows = qi_base + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = ki_base + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    cm = colmask_ref[0, :, pl.ds(ki_base, bk)]         # (1, BK) f32
    ok = _mask_ok(rows, cols, cm, num_img)
    return s + (ok - 1.0) * (-NEG_INF)


def _n_unmasked_blocks(num_img: int, bk: int, nblk: int) -> int:
    """Key blocks made purely of image columns need NO mask: every column
    < num_img is attendable from every row (image rows attend image
    cols; text rows attend image cols unconditionally, git_attention_bias
    semantics).  num_img is static, so the key loop splits statically
    into an unmasked prefix and a masked tail — a dynamic lax.cond
    per block measured 1.7x SLOWER (Mosaic can't software-pipeline
    across the branch); the static split costs nothing."""
    return min(num_img // bk, nblk)


def _fwd_kernel(seed_ref, colmask_ref, q_ref, k_ref, v_ref, o_ref,
                lse_ref, *, bk: int, scale: float, num_img: int,
                rate: float = 0.0):
    """grid = (B*H, nq).

    Matmul inputs stay in the storage dtype (bf16): the v5e MXU runs
    bf16 x bf16 -> f32 at 4x its f32 rate, and
    ``preferred_element_type=f32`` keeps the accumulation exact.  Only
    the softmax recurrences (max/exp/sum, LSE) are f32; P is cast back
    to bf16 for the P@V product (standard flash practice — P in [0,1]
    with f32 row stats loses ~1e-3 relative, well under bf16 training
    noise).

    ``rate`` > 0 applies attention-probability dropout (_hash_keep):
    the keep/scale factor multiplies P for the P@V product only — the
    row statistics (l, LSE) stay those of the UNMASKED softmax, which
    is exactly dropout-after-softmax."""
    qi = pl.program_id(1)
    bh = pl.program_id(0)
    bq = q_ref.shape[1]
    q = q_ref[0]                                      # (BQ, Dh) bf16
    lk = k_ref.shape[1]

    def body(i, carry, *, mask):
        m_run, l_run, acc = carry
        k = k_ref[0, pl.ds(i * bk, bk), :]
        v = v_ref[0, pl.ds(i * bk, bk), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mask:
            s = _mask_block(s, qi * bq, i * bk, colmask_ref, num_img)
        m_blk = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        p = jnp.exp(s - m_new[:, None])
        corr = jnp.exp(m_run - m_new)
        l_new = l_run * corr + jnp.sum(p, axis=-1)
        if rate > 0.0:
            p = p * _dropout_block(bh, qi * bq, i * bk, (bq, bk),
                                   seed_ref, rate)
        acc_new = acc * corr[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    nblk = lk // bk
    n_free = _n_unmasked_blocks(num_img, bk, nblk)
    carry = jax.lax.fori_loop(0, n_free,
                              functools.partial(body, mask=False),
                              (m0, l0, acc0))
    m_run, l_run, acc = jax.lax.fori_loop(
        n_free, nblk, functools.partial(body, mask=True), carry)
    safe_l = jnp.where(l_run == 0.0, 1.0, l_run)
    o_ref[0] = (acc / safe_l[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0, :] = m_run + jnp.log(safe_l)


def _dq_kernel(seed_ref, colmask_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
               lse_ref, dq_ref, *, bk: int, scale: float, num_img: int,
               rate: float = 0.0):
    """grid = (B*H, nq): dQ for one query block.

    Dropout backward (all three gradient kernels): with
    Q = mask*P/(1-rate), O = Q V and D_i = rowsum(dO*O) UNCHANGED
    (D_i = sum_k Q_ik dO_i.V_k exactly because O used the dropped
    probs), the chain rule gives dS = P * (mask_scaled(dO V^T) - D) and
    dV = Q^T dO — so the mask factor simply multiplies dp (and the
    dV-side P); the masks regenerate from coordinates (_hash_keep)."""
    qi = pl.program_id(1)
    bh = pl.program_id(0)
    bq = q_ref.shape[1]
    q = q_ref[0]                                       # bf16
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0, 0, :]                             # (BQ,)
    d_row = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                           # (BQ,)
    lk = k_ref.shape[1]

    def body(i, dq_acc, *, mask):
        k = k_ref[0, pl.ds(i * bk, bk), :]
        v = v_ref[0, pl.ds(i * bk, bk), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if mask:
            s = _mask_block(s, qi * bq, i * bk, colmask_ref, num_img)
        p = jnp.exp(s - lse[:, None])                  # (BQ, BK)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = dp * _dropout_block(bh, qi * bq, i * bk, (bq, bk),
                                     seed_ref, rate)
        ds = p * (dp - d_row[:, None])
        return dq_acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    nblk = lk // bk
    n_free = _n_unmasked_blocks(num_img, bk, nblk)
    dq = jax.lax.fori_loop(0, n_free,
                           functools.partial(body, mask=False), dq0)
    dq = jax.lax.fori_loop(n_free, nblk,
                           functools.partial(body, mask=True), dq)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, colmask_ref, q_ref, k_ref, v_ref, do_ref,
                o_ref, lse_ref, dk_ref, dv_ref, *, bq: int, scale: float,
                num_img: int, nk_free: int, nk: int, rate: float = 0.0):
    """grid = (B*H, nk): dK/dV for one key block.

    The mask decision is per KEY block = per program; like the fused
    kernel, the image-prefix/masked-tail split is a program-level
    ``pl.when`` pair inside ONE pallas_call (the r3 original launched
    two calls and paid dK/dV concats for it)."""
    ki = pl.program_id(1)
    bh = pl.program_id(0)
    bk = k_ref.shape[1]
    k = k_ref[0]                                       # (BK, Dh) bf16
    v = v_ref[0]
    lq = q_ref.shape[1]

    def run(mask: bool):
        def body(i, carry):
            dk_acc, dv_acc = carry
            q = q_ref[0, pl.ds(i * bq, bq), :]
            do = do_ref[0, pl.ds(i * bq, bq), :]
            o = o_ref[0, pl.ds(i * bq, bq), :]
            lse = lse_ref[0, 0, pl.ds(i * bq, bq)]     # (BQ,)
            d_row = jnp.sum(do.astype(jnp.float32)
                            * o.astype(jnp.float32), axis=-1)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mask:
                s = _mask_block(s, i * bq, ki * bk, colmask_ref,
                                num_img)
            p = jnp.exp(s - lse[:, None])              # (BQ, BK)
            # dV's matmul consumes P before dp materialises — same
            # scoped-VMEM liveness ordering as _fused_bwd_kernel
            if rate > 0.0:
                dm = _dropout_block(bh, i * bq, ki * bk, (bq, bk),
                                    seed_ref, rate)
                dv_acc = dv_acc + jax.lax.dot_general(
                    (p * dm).astype(do.dtype), do,     # dV uses dropped P
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (BK, Dh)
                dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32
                                         ) * dm
            else:
                dv_acc = dv_acc + jax.lax.dot_general(
                    p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (BK, Dh)
                dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            ds = p * (dp - d_row[:, None])             # (BQ, BK)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (BK, Dh)
            return dk_acc, dv_acc

        z = jnp.zeros((bk, k.shape[1]), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, lq // bq, body, (z, z))
        dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    if nk_free <= 0:
        run(True)
    elif nk_free >= nk:
        run(False)
    else:
        @pl.when(ki < nk_free)
        def _free():
            run(False)

        @pl.when(ki >= nk_free)
        def _masked():
            run(True)


def _fused_bwd_kernel(seed_ref, colmask_ref, q_ref, k_ref, v_ref, do_ref,
                      o_ref, lse_ref, dq_ref, dk_ref, dv_ref, *, bq: int,
                      scale: float, num_img: int, nk_free: int,
                      nk: int, rate: float = 0.0):
    """grid = (B*H, nk): all three gradients in one pass per key block.

    dq_ref is the full (1, s_pad, Dh) f32 row whose index map ignores
    the key-block grid dim — revisited across programs of one (b, h)
    row, so ``+=`` accumulates in VMEM and spills to HBM once per row.
    The scale is folded into the bf16 cast of dS (exact when Dh is a
    power of two — scale is then a power of two; all shipped configs
    have Dh=64) so neither dQ nor dK needs a post-loop rescale that a
    cross-program accumulator could not express.

    The mask decision is per KEY block = per program, and here the
    static fwd/dq-style loop split becomes a program-level ``pl.when``
    pair on ``ki < nk_free``: image-prefix programs run the mask-free
    body, tail programs the masked one.  Measured r3 at the flagship
    shape, ms per 6-matmul layer backward: call-level split into two
    pallas_calls (the r3 original — pays an extra f32 dQ array + add +
    dK/dV concats) 8.00; one all-masked call 7.39; this 7.21 (1.11x),
    bitwise-identical outputs."""
    ki = pl.program_id(1)
    bh = pl.program_id(0)
    bk = k_ref.shape[1]
    k = k_ref[0]                                       # (BK, Dh) bf16
    v = v_ref[0]
    lq = q_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def run(mask: bool):
        def body(i, carry):
            dk_acc, dv_acc = carry
            q = q_ref[0, pl.ds(i * bq, bq), :]
            do = do_ref[0, pl.ds(i * bq, bq), :]
            o = o_ref[0, pl.ds(i * bq, bq), :]
            lse = lse_ref[0, 0, pl.ds(i * bq, bq)]     # (BQ,)
            d_row = jnp.sum(do.astype(jnp.float32)
                            * o.astype(jnp.float32), axis=-1)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mask:
                s = _mask_block(s, i * bq, ki * bk, colmask_ref,
                                num_img)
            p = jnp.exp(s - lse[:, None])              # (BQ, BK)
            # Liveness order matters for scoped VMEM: dV's matmul must
            # consume its P operand BEFORE dp materialises (p/dp/pd all
            # live together pushed the (896,896) pair 360K over the
            # 16M scoped limit at s_pad 1792 — a frontier regression vs
            # r3 even at rate=0).
            if rate > 0.0:
                dm = _dropout_block(bh, i * bq, ki * bk, (bq, bk),
                                    seed_ref, rate)
                dv_acc = dv_acc + jax.lax.dot_general(
                    (p * dm).astype(do.dtype), do,     # dV uses dropped P
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (BK, Dh)
                dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32
                                         ) * dm
            else:
                dv_acc = dv_acc + jax.lax.dot_general(
                    p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (BK, Dh)
                dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            ds = (p * (dp - d_row[:, None]) * scale).astype(q.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (BK, Dh)
            dq_ref[0, pl.ds(i * bq, bq), :] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (BQ, Dh)
            return dk_acc, dv_acc

        z = jnp.zeros((bk, k.shape[1]), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, lq // bq, body, (z, z))
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    if nk_free <= 0:                 # static: no mask-free prefix
        run(True)
    elif nk_free >= nk:              # static: nothing masked (L==0 use)
        run(False)
    else:
        @pl.when(ki < nk_free)
        def _free():
            run(False)

        @pl.when(ki >= nk_free)
        def _masked():
            run(True)


def _prepare(q, k, v, attention_mask, num_img, bq, bk):
    b, h, s, dh = q.shape
    # pad to a multiple of BOTH blocks: the grids floor-divide s_pad by
    # bq (query programs) and bk (key loop trips / dkv programs), so a
    # max()-based pad would silently skip tail rows for non-dividing
    # user-supplied pairs
    s_pad = s + ((-s) % math.lcm(bq, bk))
    pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    qp = pad(q).reshape(b * h, s_pad, dh)
    kp = pad(k).reshape(b * h, s_pad, dh)
    vp = pad(v).reshape(b * h, s_pad, dh)
    colmask = jnp.concatenate(
        [jnp.ones((b, num_img), jnp.float32),
         attention_mask.astype(jnp.float32),
         jnp.zeros((b, s_pad - s), jnp.float32)], axis=1)[:, None, :]
    return qp, kp, vp, colmask, s_pad


def _seed_spec():
    """(1,) int32 dropout seed, whole-array in SMEM for every program."""
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _specs(bq_blk, s_pad, dh, h):
    """(seed, colmask, q, k, v) input specs shared by fwd/dq; block over
    dim 1 of the first tensor arg with width bq_blk."""
    return [
        _seed_spec(),
        pl.BlockSpec((1, 1, s_pad), lambda bh_i, qi, h=h: (bh_i // h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq_blk, dh), lambda bh_i, qi: (bh_i, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_pad, dh), lambda bh_i, qi: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s_pad, dh), lambda bh_i, qi: (bh_i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _forward(q, k, v, attention_mask, seed, num_img, bq, bk, rate=0.0):
    b, h, s, dh = q.shape
    qp, kp, vp, colmask, s_pad = _prepare(q, k, v, attention_mask,
                                          num_img, bq, bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, bk=bk, scale=dh ** -0.5,
                          num_img=num_img, rate=rate),
        grid=(b * h, s_pad // bq),
        in_specs=_specs(bq, s_pad, dh, h),
        out_specs=(
            pl.BlockSpec((1, bq, dh), lambda bh_i, qi: (bh_i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh_i, qi: (bh_i, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, s_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=3 * qp.size * qp.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(seed, colmask, qp, kp, vp)
    return out.reshape(b, h, s_pad, dh)[:, :, :s, :], (qp, kp, vp, colmask,
                                                       out, lse, s_pad,
                                                       seed)


# Fused single-pass backward (default).  The split two-pass kernels are
# kept selectable for A/B measurement and serve as the fallback when the
# fused kernel's VMEM footprint would not fit.
FUSED_BWD = True

# Scoped-VMEM budget for the fused kernel's estimated footprint.  The
# estimate has two terms: the body's live (bq, bk) temporaries (s/p/dp
# f32 + ds bf16 = 14 B/elem) and the full-row buffers (q/do/o bf16
# double-buffered + dq f32 + lse ≈ 16 B per s_pad*dh elem).  Calibrated
# by compile probes on the v5e (r3), all at 896x896 blocks, realistic
# b*h grids: s_pad 1792 (est 12.5 MiB) and 2688 (13.34 MiB) COMPILE,
# 3584 (est 14.22 MiB; actual scoped 17.48M vs the 16 MiB hardware
# limit) and 4480 (15.1 MiB) DO NOT — so the budget sits at 13.8 MiB,
# between the measured pass/fail.
_FUSED_VMEM_BUDGET = int(13.8 * 2 ** 20)

# Second, independent guard: the linear estimate UNDERPREDICTS for
# small-block/large-row shapes — 640x640 at s_pad=4480 estimates
# 10.3 MiB yet Mosaic's actual scoped allocation is 16.17 MiB (compile
# OOM, measured r3; the row-proportional footprint is super-linear in a
# way no single-coefficient model fits all calibration points), so the
# row cap is a PER-BLOCK-PAIR table of measured compile-probe results
# (r3, realistic b*h grids).  Each cap is the largest PROBED-good
# reachable s_pad (a multiple of the pair's lcm); the next reachable
# multiple either failed or is unprobed:
#   (512,1024): pass 3072 (16.3 ms vs split ~19), FAIL 4096  -> 3072
#   (896, 896): pass 1792/2688, FAIL 3584 -> 3200 (no reachable s_pad
#               lies between 2688 and 3584)
#   (768, 768): pass 3072 and 3840, 4608 unprobed            -> 3840
#   (640, 640): pass 3200 (17.7 vs split 20.4), FAIL 4480    -> 3200
#   (512, 512): pass 4608 (33.6 ms at the vitl16 shape vs the 896-split
#               formulation's 35.0), FAIL 5120     -> 4608 (exact edge)
# Unknown (user-supplied) pairs fall back to the conservative 2944.
_FUSED_MAX_SPAD = {(512, 1024): 3072, (896, 896): 3200,
                   (768, 768): 3840, (640, 640): 3200, (512, 512): 4608}
_FUSED_MAX_SPAD_DEFAULT = 2944


def _fused_vmem_estimate(s_pad, dh, bq, bk, rate=0.0):
    # rate-independent: the dropout tile temporaries' VMEM delta is
    # super-linear in block size (no single per-elem coefficient
    # separates the probed pass/fail points) and is captured by the
    # per-pair _FUSED_MAX_SPAD_DROPOUT table instead; this linear model
    # only guards dh values the tables were not probed at (all tables
    # are dh=64 compile probes)
    return bq * bk * 14 + s_pad * dh * 16


# Dropout shrinks each pair's frontier (the regenerated keep-factor
# tile adds live f32/int32 temporaries to the inner loop).  Probed r4
# on the v5e at rate=0.1, realistic b*h grids, with the final operand
# ordering (dV matmul consumes P before dp materialises — with the
# naive ordering even the flagship 896x896/1792 shape OOMs):
#   (896, 896): pass 1792, FAIL 2688                          -> 1792
#   (768, 768): pass 2304, FAIL 3072                          -> 2304
#   (640, 640): pass 3200, FAIL 4480                          -> 3200
#   (512,1024): pass 2048, FAIL 3072                          -> 2048
#   (512, 512): pass 4096, FAIL 4608 (vitl16's 4608 ->split)  -> 4096
_FUSED_MAX_SPAD_DROPOUT = {(512, 1024): 2048, (896, 896): 1792,
                           (768, 768): 2304, (640, 640): 3200,
                           (512, 512): 4096}
_FUSED_MAX_SPAD_DROPOUT_DEFAULT = 1792


def _fused_eligible(s_pad: int, dh: int, bq: int, bk: int,
                    rate: float = 0.0) -> bool:
    if rate > 0.0:
        cap = _FUSED_MAX_SPAD_DROPOUT.get(
            (bq, bk), _FUSED_MAX_SPAD_DROPOUT_DEFAULT)
    else:
        cap = _FUSED_MAX_SPAD.get((bq, bk), _FUSED_MAX_SPAD_DEFAULT)
    return (FUSED_BWD and s_pad <= cap and
            _fused_vmem_estimate(s_pad, dh, bq, bk, rate)
            <= _FUSED_VMEM_BUDGET)


def _backward(res, g, num_img, bq, bk, b, h, s, dh, rate=0.0):
    s_pad = res[6]
    fn = (_backward_fused if _fused_eligible(s_pad, dh, bq, bk, rate)
          else _backward_split)
    return fn(res, g, num_img, bq, bk, b, h, s, dh, rate)


def _backward_fused(res, g, num_img, bq, bk, b, h, s, dh, rate=0.0):
    """ONE pallas_call over every key block; the mask-free/masked split
    is the program-level pl.when inside _fused_bwd_kernel.  (The r3
    original launched two calls — mask-free prefix + masked tail — and
    paid a second f32 dQ array, an XLA add and dK/dV concats for it:
    measured 8.00 vs 7.21 ms per layer backward at the flagship shape,
    identical outputs.)"""
    qp, kp, vp, colmask, outp, lse, s_pad, seed = res
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
                 ).reshape(b * h, s_pad, dh)

    full = lambda: pl.BlockSpec((1, s_pad, dh),
                                lambda bh_i, i: (bh_i, 0, 0),
                                memory_space=pltpu.VMEM)
    cm_spec = pl.BlockSpec((1, 1, s_pad), lambda bh_i, i, h=h:
                           (bh_i // h, 0, 0), memory_space=pltpu.VMEM)
    lse_full = pl.BlockSpec((1, 1, s_pad), lambda bh_i, i: (bh_i, 0, 0),
                            memory_space=pltpu.VMEM)
    kblk = lambda: pl.BlockSpec((1, bk, dh), lambda bh_i, i: (bh_i, i, 0),
                                memory_space=pltpu.VMEM)
    # dq: full-row block, index map ignores the key grid dim — the
    # cross-program accumulator (kernel docstring)
    dq_spec = pl.BlockSpec((1, s_pad, dh), lambda bh_i, i: (bh_i, 0, 0),
                           memory_space=pltpu.VMEM)

    nk = s_pad // bk
    nk_free = _n_unmasked_blocks(num_img, bk, nk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, bq=bq, scale=dh ** -0.5,
                          num_img=num_img, nk_free=nk_free, nk=nk,
                          rate=rate),
        grid=(b * h, nk),
        in_specs=[_seed_spec(), cm_spec, full(), kblk(), kblk(), full(),
                  full(), lse_full],
        out_specs=(dq_spec, kblk(), kblk()),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * h, s_pad, dh), kp.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, dh), vp.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s_pad * s_pad * dh,
            bytes_accessed=5 * b * h * s_pad * dh * 2,
            transcendentals=b * h * s_pad * s_pad,
        ),
        compiler_params=_PARALLEL_ROWS_ONLY,
        interpret=_INTERPRET,
    )(seed, colmask, qp, kp, vp, gp, outp, lse)

    unpad = lambda x: x.reshape(b, h, s_pad, dh)[:, :, :s, :]
    return unpad(dq.astype(qp.dtype)), unpad(dk), unpad(dv)


def _backward_split(res, g, num_img, bq, bk, b, h, s, dh, rate=0.0):
    qp, kp, vp, colmask, outp, lse, s_pad, seed = res
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
                 ).reshape(b * h, s_pad, dh)

    full = lambda: pl.BlockSpec((1, s_pad, dh),
                                lambda bh_i, i: (bh_i, 0, 0),
                                memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((1, bq, dh), lambda bh_i, i: (bh_i, i, 0),
                               memory_space=pltpu.VMEM)
    cm_spec = pl.BlockSpec((1, 1, s_pad), lambda bh_i, i, h=h:
                           (bh_i // h, 0, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, 1, bq), lambda bh_i, i: (bh_i, 0, i),
                           memory_space=pltpu.VMEM)
    lse_full = pl.BlockSpec((1, 1, s_pad), lambda bh_i, i: (bh_i, 0, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bk=bk, scale=dh ** -0.5,
                          num_img=num_img, rate=rate),
        grid=(b * h, s_pad // bq),
        in_specs=[_seed_spec(), cm_spec, blk(), full(), full(), blk(),
                  blk(), lse_blk],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), qp.dtype),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(seed, colmask, qp, kp, vp, gp, outp, lse)

    # dK/dV: the mask decision is per key block — the pl.when split on
    # the image-column prefix lives inside the kernel (one call)
    nk = s_pad // bk
    nk_free = _n_unmasked_blocks(num_img, bk, nk)
    kblk = lambda: pl.BlockSpec((1, bk, dh), lambda bh_i, i: (bh_i, i, 0),
                                memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, scale=dh ** -0.5,
                          num_img=num_img, nk_free=nk_free, nk=nk,
                          rate=rate),
        grid=(b * h, nk),
        in_specs=[_seed_spec(), cm_spec, full(), kblk(), kblk(), full(),
                  full(), lse_full],
        out_specs=(kblk(), kblk()),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, dh), kp.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, dh), vp.dtype)),
        compiler_params=_PARALLEL2,
        interpret=_INTERPRET,
    )(seed, colmask, qp, kp, vp, gp, outp, lse)

    unpad = lambda x: x.reshape(b, h, s_pad, dh)[:, :, :s, :]
    return unpad(dq), unpad(dk), unpad(dv)


def git_flash_attention(q, k, v, attention_mask, num_img: int,
                        block_q: Optional[int] = None,
                        block_k: Optional[int] = None,
                        fwd_only: bool = False,
                        dropout_rate: float = 0.0,
                        dropout_seed=None):
    """(B, H, S, Dh) self-attention under the GIT combined mask.

    attention_mask: (B, L) text padding mask with S = num_img + L.
    block_q/block_k default to a shape-aware choice (see _choose_blocks)
    when BOTH are unset; setting only one makes the other match it
    (square blocks) — mixing a user block with a shape-chosen one would
    inflate the lcm padding.  Resolution happens *here*, outside the
    custom_vjp, so forward and backward agree.  ``fwd_only`` is a
    perf-only hint (eval/inference: no split-backward penalty in the
    block choice); gradients through a fwd_only call remain correct.

    ``dropout_rate`` > 0 applies attention-probability dropout with the
    coordinate-hash RNG (_hash_keep) — the reference trains through HF
    GitSelfAttention's dropout(0.1) on softmax weights (PARITY #8).
    ``dropout_seed``: int32 scalar; vary per (layer, step).
    """
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate {dropout_rate} not in [0, 1)")
    if block_q is None and block_k is None:
        block_q, block_k = _choose_blocks(q.shape[-2], q.shape[-1],
                                          fwd_only=fwd_only,
                                          rate=dropout_rate)
    else:
        block_q = block_q or block_k
        block_k = block_k or block_q
        if not _INTERPRET and (block_q % 128 or block_k % 128):
            # Mosaic constraint (see _BLOCK_CANDIDATES): catch it here
            # as a clear error instead of an opaque lowering failure
            raise ValueError(f"git_flash blocks must be multiples of "
                             f"128 on TPU, got ({block_q}, {block_k})")
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
    return _git_flash_core(q, k, v, attention_mask, seed, num_img,
                           block_q, block_k, float(dropout_rate))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _git_flash_core(q, k, v, attention_mask, seed, num_img: int,
                    block_q: int, block_k: int, rate: float):
    out, _ = _forward(q, k, v, attention_mask, seed, num_img,
                      block_q, block_k, rate)
    return out


def _fwd(q, k, v, attention_mask, seed, num_img, block_q, block_k, rate):
    out, res = _forward(q, k, v, attention_mask, seed, num_img,
                        block_q, block_k, rate)
    return out, (res, q.shape)


def _bwd(num_img, block_q, block_k, rate, packed, g):
    res, (b, h, s, dh) = packed
    if s >= PALLAS_BWD_MIN_SEQ:
        dq, dk, dv = _backward(res, g, num_img, block_q, block_k,
                               b, h, s, dh, rate)
        return dq, dk, dv, None, None
    # short-seq: XLA dense recompute is faster (see PALLAS_BWD_MIN_SEQ)
    qp, kp, vp, colmask, _outp, _lse, s_pad, seed = res
    unpad = lambda x: x.reshape(b, h, s_pad, dh)[:, :, :s, :]
    q, k, v = unpad(qp), unpad(kp), unpad(vp)
    attention_mask = colmask[:, 0, num_img:s].astype(jnp.int32)
    from sasvqa_tpu.models.git import git_attention_bias
    bias = git_attention_bias(num_img, attention_mask, dtype=jnp.float32)

    def f(q, k, v):
        scale = q.shape[-1] ** -0.5
        s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale + bias
        p = jax.nn.softmax(s_, axis=-1)
        if rate > 0.0:
            p = p * hash_dropout_factor(b, h, s, seed[0], rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32
                          ).astype(q.dtype)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_git_flash_core.defvjp(_fwd, _bwd)
