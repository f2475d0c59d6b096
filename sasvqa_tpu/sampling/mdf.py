"""MDF — most-dominant-frame sampling, on-device.

Rebuild of ``sample_representative_frames``
(reference: src/preprocessing/datautils/utils.py:31-94):

1. encode every decoded frame with a frozen vision encoder, L2-normalize
   pooled features;
2. windowed local-average cosine similarity
   ``lcl_avg[i] = (sum_{j in [i-W, i+W)} f_i . f_j - 1) / (2W - 1)``
   for ``i in [W, N-W)``, 0 elsewhere;
3. greedy max-heap interval splitting that picks K peaks with pairwise
   suppression window W, in importance order; if the heap exhausts
   before K picks, fall back to the plain top-K of ``lcl_avg``.

TPU-first redesign:

- the reference materialises the full N x N similarity matrix on GPU
  (utils.py:54-55) even though only the +-W band is consumed; here the
  banded row-sum is computed from a cumulative feature sum in O(N*D)
  — ``S_i = cs[i+W] - cs[i-W]`` then ``lcl_avg_i = (f_i . S_i - 1)/(2W-1)``
  — no N x N tensor exists at any point (SURVEY.md §5.7);
- the heap search is reformulated as a fixed-trip-count masked-argmax
  loop with suppression window ``[idx-W, idx+W)`` (exactly the interval
  arithmetic the heap performs — see test_mdf.py golden tests), which
  jits and runs on-device;
- the whole pipeline (encode -> band -> select) is one jit region;
  frames batch through the encoder rather than chunked Python loops.

``mdf_reference_numpy`` reimplements the reference's exact heap
algorithm on the host as the golden oracle.
"""

from __future__ import annotations

import heapq
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -3.0e38


def local_average_similarity(feats: jax.Array, window: int,
                             n_valid=None) -> jax.Array:
    """Banded local-average cosine similarity, (N, D) -> (N,).

    feats must be L2-normalized.  Matches reference utils.py:58-61:
    values for i in [W, N_valid-W), zero at the boundaries.  When the
    array is padded beyond ``n_valid``, pad rows must be zero vectors;
    their band windows are never read by valid positions.
    """
    n = feats.shape[0]
    if n_valid is None:
        n_valid = n
    w = window
    cs = jnp.cumsum(feats, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)  # (N+1, D)
    idx = jnp.arange(n)
    lo = jnp.clip(idx - w, 0, n)
    hi = jnp.clip(idx + w, 0, n)
    band_sum = cs[hi] - cs[lo]                      # (N, D)
    dots = jnp.einsum("nd,nd->n", feats, band_sum)
    lcl = (dots - 1.0) / (2 * w - 1)
    valid = (idx >= w) & (idx < n_valid - w)
    return jnp.where(valid, lcl, 0.0)


def suppression_topk(lcl_avg: jax.Array, k: int, window: int,
                     valid: Optional[jax.Array] = None,
                     ) -> Tuple[jax.Array, jax.Array]:
    """Iterative masked-argmax with suppression window [idx-W, idx+W).

    Provably equivalent to the reference's heap interval search: the
    intervals partition the unsuppressed index set and each contributes
    its max, so popping the best interval == global masked argmax.

    ``valid``: optional (N,) bool — rows that exist at all (bucket pad
    rows are False).  The exhaustion check must run over VALID rows
    only: pad rows are never suppressed, so counting them would keep the
    mask non-empty forever and the fallback would never fire for short
    videos.

    Returns (indices (k,) importance-ordered, exhausted flag).  When the
    mask empties before k picks the reference discards partial results
    and returns plain top-k of lcl_avg (utils.py:91-93) — replicated.
    """
    n = lcl_avg.shape[0]
    w = window
    pos = jnp.arange(n)

    def body(i, carry):
        mask, picks, exhausted = carry
        masked = jnp.where(mask, lcl_avg, NEG)
        idx = jnp.argmax(masked)
        empty = ~jnp.any(mask)
        exhausted = exhausted | empty
        picks = picks.at[i].set(idx)
        suppress = (pos >= idx - w) & (pos < idx + w)
        mask = mask & ~suppress
        return mask, picks, exhausted

    mask0 = jnp.ones((n,), bool) if valid is None else valid
    init = (mask0, jnp.zeros((k,), jnp.int32), jnp.array(False))
    _, picks, exhausted = jax.lax.fori_loop(0, k, body, init)

    fallback = jax.lax.top_k(lcl_avg, k)[1].astype(jnp.int32)
    picks = jnp.where(exhausted, fallback, picks)
    return picks, exhausted


def mdf_select(feats: jax.Array, k: int, window: int = -1,
               interval: int = 20) -> Tuple[jax.Array, jax.Array]:
    """Full on-device MDF: pooled features (N, D) -> (indices (k,), flag).

    window == -1 uses the adaptive width N // interval
    (reference utils.py:32-33, INTERVAL=20).  Static shapes only — the
    caller buckets N.
    """
    n = feats.shape[0]
    if window == -1:
        window = n // interval
    window = max(window, 1)  # oracle clamps too; W=0 would flip the
    # lcl denominator sign and make the suppression interval empty
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    lcl = local_average_similarity(feats, window)
    return suppression_topk(lcl, k, window)


def mdf_select_batched(feats: jax.Array, k: int, window: int = -1,
                       interval: int = 20) -> Tuple[jax.Array, jax.Array]:
    """vmapped MDF over (B, N, D) feature stacks -> (B, k) indices."""
    return jax.vmap(lambda f: mdf_select(f, k, window, interval))(feats)


def mdf_select_padded(feats: jax.Array, n_valid, k: int, window: int,
                      interval: int = 20) -> Tuple[jax.Array, jax.Array]:
    """MDF over a bucket-padded feature array (B, D) with ``n_valid``
    real rows.  ``window`` must be pre-resolved by the caller (adaptive
    W = N//interval is host-computable because N is known there) so one
    compile serves a whole (bucket, W) class of videos.

    Pad rows are masked to -inf so neither the suppression loop nor the
    top-K fallback can pick them, and they are EXCLUDED from the
    exhaustion check (they are never suppressed, so counting them would
    keep the fallback from ever firing on short videos); results equal
    :func:`mdf_select` on the unpadded array
    (tests/test_mdf.py::test_padded_matches_unpadded).
    """
    window = max(window, 1)
    b = feats.shape[0]
    norms = jnp.linalg.norm(feats, axis=-1, keepdims=True)
    f = feats / jnp.maximum(norms, 1e-12)
    idx = jnp.arange(b)
    in_range = (idx < n_valid)[:, None]
    f = jnp.where(in_range, f, 0.0)
    lcl = local_average_similarity(f, window, n_valid=n_valid)
    lcl = jnp.where(idx < n_valid, lcl, NEG)
    picks, exhausted = suppression_topk(lcl, k, window,
                                        valid=idx < n_valid)
    return jnp.minimum(picks, n_valid - 1), exhausted


# --------------------------------------------------------------------------
# host golden reference (the reference algorithm, verbatim semantics)


def mdf_reference_numpy(feats: np.ndarray, k: int, window: int = -1,
                        interval: int = 20) -> np.ndarray:
    """Numpy reimplementation of utils.py:31-94 (heap + fallback).

    feats: (N, D) unnormalized pooled features.  Returns (k,) indices in
    importance order.  Oracle for golden tests of the on-device path.
    """
    n = feats.shape[0]
    w = n // interval if window == -1 else window
    w = max(w, 1)
    f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    sims = f @ f.T
    lcl = np.zeros(n, dtype=np.float64)
    for i in range(w, n - w):
        sub = sims[i][i - w:i + w]
        lcl[i] = (sub.sum() - 1) / (len(sub) - 1)

    top = int(lcl.argmax())
    res = [top]
    heap: list = []
    counter = 0  # tie-breaker so the heap never compares ndarrays

    def push(l, r):
        nonlocal counter
        if r > l:
            seg = lcl[l:r]
            v = seg.max()
            idx = l + int(seg.argmax())
            heapq.heappush(heap, (-v, counter, (l, r), idx))
            counter += 1

    if top - w > 0:
        push(0, top - w)
    if top + w < n:
        push(top + w, n)

    while len(res) < k and heap:
        _, _, (l, r), idx = heapq.heappop(heap)
        res.append(idx)
        if idx - w > l:
            push(l, idx - w)
        if idx + w < r:
            push(idx + w, r)

    if len(res) < k:
        # fallback replaces all picks with plain top-k (utils.py:91-93)
        res = np.argsort(-lcl, kind="stable")[:k].tolist()
    return np.asarray(res, dtype=np.int32)


def make_mdf_pipeline(encode_fn: Callable[[jax.Array], jax.Array],
                      k: int, window: int = -1, interval: int = 20):
    """Build a jitted frames->indices pipeline.

    ``encode_fn``: (N, H, W, C) -> (N, D) pooled features (e.g. the GIT
    vision tower's pooled output under frozen params).
    """
    @jax.jit
    def pipeline(frames: jax.Array) -> Tuple[jax.Array, jax.Array]:
        feats = encode_fn(frames)
        return mdf_select(feats, k, window, interval)

    return pipeline
