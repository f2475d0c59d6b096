"""Collator frame re-sampling policy index math
(reference semantics: dataset_video_qa.py:203-216,343-362)."""

import numpy as np
import pytest

from sasvqa_tpu.sampling import policies


def test_uniform_strides_by_nframe():
    # reference 'uniform' strides by nframe: K=8, nframe=4 -> [0, 4]
    inds = policies.sample_indices("uniform", 8, 4, batch_size=2)
    assert inds.tolist() == [[0, 4], [0, 4]]
    # K=10, nframe=4 -> ceil(10/4)=3 frames: [0, 4, 8]
    inds = policies.sample_indices("uniform", 10, 4)
    assert inds.tolist() == [[0, 4, 8]]


def test_single_picks_middle():
    assert policies.sample_indices("single", 8, 4).tolist() == [[4]]
    assert policies.sample_indices("single", 7, 4).tolist() == [[3]]


def test_random_no_replacement():
    rng = np.random.default_rng(0)
    inds = policies.sample_indices("random", 8, 4, rng=rng, batch_size=16)
    assert inds.shape == (16, 4)
    for row in inds:
        assert len(set(row.tolist())) == 4
        assert all(0 <= i < 8 for i in row)


def test_random_is_index_weighted_multinomial():
    """Reference draws torch.multinomial(arange(K), nframe) — frame i
    with probability proportional to i, frame 0 never
    (dataset_video_qa.py:207-209)."""
    k, n = 6, 1
    rng = np.random.default_rng(7)
    draws = policies.sample_indices("random", k, n, rng=rng,
                                    batch_size=6000).ravel()
    assert (draws != 0).all(), "frame 0 has weight 0, must never appear"
    counts = np.bincount(draws, minlength=k).astype(np.float64)
    expected = np.arange(k) / np.arange(k).sum()
    np.testing.assert_allclose(counts / counts.sum(), expected, atol=0.02)


def test_random_matches_torch_multinomial_distribution():
    """Multi-draw (without replacement) marginals match torch's on the
    same weights."""
    import torch
    k, n, trials = 5, 2, 4000
    torch.manual_seed(0)
    w = torch.arange(k).float().expand(trials, -1)
    t_draws = torch.multinomial(w, num_samples=n, replacement=False)
    t_freq = np.bincount(t_draws.numpy().ravel(), minlength=k) / (trials * n)
    rng = np.random.default_rng(11)
    j_draws = policies.sample_indices("random", k, n, rng=rng,
                                      batch_size=trials)
    j_freq = np.bincount(j_draws.ravel(), minlength=k) / (trials * n)
    np.testing.assert_allclose(j_freq, t_freq, atol=0.025)


def test_random_rejects_nframe_equal_k():
    # torch.multinomial errors when num_samples exceeds the K-1 nonzero-
    # weight categories; replicate as an assertion
    with pytest.raises(AssertionError):
        policies.sample_indices("random", 4, 4,
                                rng=np.random.default_rng(0))


def test_question_caption_uses_first_nframe():
    si = np.array([[3, 7, 1, 5, 0, 2, 4, 6],
                   [2, 0, 6, 1, 3, 4, 5, 7]])
    inds = policies.sample_indices("question-caption", 8, 3,
                                   sampled_inds=si, batch_size=2)
    assert inds.tolist() == [[3, 7, 1], [2, 0, 6]]


def test_importance_takes_prefix():
    inds = policies.sample_indices("importance", 8, 3, batch_size=2)
    assert inds.tolist() == [[0, 1, 2], [0, 1, 2]]


def test_gather_frames():
    frames = np.arange(2 * 4 * 3).reshape(2, 4, 3)
    inds = np.array([[1, 3], [0, 2]])
    out = policies.gather_frames(frames, inds)
    assert out.shape == (2, 2, 3)
    np.testing.assert_array_equal(out[0, 0], frames[0, 1])
    np.testing.assert_array_equal(out[1, 1], frames[1, 2])


def test_num_output_frames_matches_reference():
    assert policies.num_output_frames("uniform", 8, 4) == 2
    assert policies.num_output_frames("uniform", 10, 4) == 3
    assert policies.num_output_frames("single", 8, 4) == 1
    assert policies.num_output_frames("random", 8, 4) == 4
    with pytest.raises(ValueError):
        policies.num_output_frames("nope", 8, 4)
