"""Golden tests: on-device MDF == reference heap algorithm.

The suppression-top-K reformulation (sampling/mdf.py) must pick exactly
the same frames in the same importance order as the reference's greedy
heap interval search (utils.py:64-93), including the plain-top-K
fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sasvqa_tpu.sampling.mdf import (local_average_similarity,
                                     mdf_reference_numpy, mdf_select,
                                     suppression_topk)


def _lcl_avg_numpy(feats, w):
    f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    sims = f @ f.T
    n = len(f)
    lcl = np.zeros(n)
    for i in range(w, n - w):
        sub = sims[i][i - w:i + w]
        lcl[i] = (sub.sum() - 1) / (len(sub) - 1)
    return lcl


@pytest.mark.parametrize("n,w", [(64, 4), (100, 5), (30, 3)])
def test_banded_local_average_matches_dense(n, w):
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, 16)).astype(np.float32)
    ref = _lcl_avg_numpy(feats, w)
    f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    ours = np.asarray(local_average_similarity(jnp.asarray(f), w))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("seed", range(8))
def test_suppression_topk_matches_heap(seed):
    rng = np.random.default_rng(seed)
    n, d, k, w = 80, 12, 8, 5
    feats = rng.normal(size=(n, d)).astype(np.float64)
    ref_inds = mdf_reference_numpy(feats, k, window=w)
    ours, _ = mdf_select(jnp.asarray(feats, jnp.float32), k, window=w)
    assert np.asarray(ours).tolist() == ref_inds.tolist()


def test_fallback_when_exhausted():
    # W so large that suppression empties before K picks -> plain top-K
    rng = np.random.default_rng(3)
    n, k, w = 40, 8, 15
    feats = rng.normal(size=(n, 8)).astype(np.float64)
    ref_inds = mdf_reference_numpy(feats, k, window=w)
    ours, exhausted = mdf_select(jnp.asarray(feats, jnp.float32), k, window=w)
    assert bool(exhausted)
    assert np.asarray(ours).tolist() == ref_inds.tolist()


def test_adaptive_width():
    rng = np.random.default_rng(7)
    n, k = 100, 6
    feats = rng.normal(size=(n, 8)).astype(np.float64)
    ref_inds = mdf_reference_numpy(feats, k, window=-1, interval=20)  # W=5
    ours, _ = mdf_select(jnp.asarray(feats, jnp.float32), k, window=-1,
                         interval=20)
    assert np.asarray(ours).tolist() == ref_inds.tolist()


def test_importance_order_and_min_distance():
    rng = np.random.default_rng(11)
    n, k, w = 120, 6, 6
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    inds, exhausted = mdf_select(jnp.asarray(feats), k, window=w)
    inds = np.asarray(inds)
    # n=120, k=6, w=6 leaves plenty of room: exhaustion here would be a
    # regression (and would have skipped every property assert below)
    assert not bool(exhausted)
    lcl = np.asarray(local_average_similarity(
        jnp.asarray(feats / np.linalg.norm(feats, axis=-1,
                                           keepdims=True)), w))
    # importance order: non-increasing scores
    scores = lcl[inds]
    assert all(scores[i] >= scores[i + 1] - 1e-6
               for i in range(len(scores) - 1))
    # pairwise distance >= W under the [idx-W, idx+W) window means
    # later picks are never within W *below* an earlier pick
    for i in range(k):
        for j in range(i + 1, k):
            d = inds[j] - inds[i]
            assert not (-w <= d < w), (inds[i], inds[j])


def test_padded_matches_unpadded():
    """mdf_select_padded on a bucket-padded array must reproduce
    mdf_select on the unpadded array — including the short-video case
    where the suppression search exhausts and the top-k fallback fires
    (regression: pad rows used to keep the exhaustion check from ever
    firing, yielding duplicate index-0 picks)."""
    from sasvqa_tpu.sampling.mdf import mdf_select_padded

    rng = np.random.default_rng(13)
    k = 6
    for n, w, bucket in [(20, 4, 64),   # exhausts -> fallback
                         (100, 5, 128),  # normal path
                         (64, 8, 64)]:   # no padding at all
        feats = rng.normal(size=(n, 8)).astype(np.float32)
        ref_inds, ref_ex = mdf_select(jnp.asarray(feats), k, window=w)
        padded = np.zeros((bucket, 8), np.float32)
        padded[:n] = feats
        got, got_ex = mdf_select_padded(jnp.asarray(padded), n, k, w)
        assert bool(got_ex) == bool(ref_ex), (n, w, bucket)
        assert np.asarray(got).tolist() == np.asarray(ref_inds).tolist()
        # and both match the host oracle
        oracle = mdf_reference_numpy(feats, k, window=w)
        assert np.asarray(got).tolist() == oracle.tolist()
