"""Auxiliary subsystems: retrieval metrics, MLM masking, profiling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sasvqa_tpu.core.profiling import StepTimer, Timer, synced
from sasvqa_tpu.data.mlm import mask_tokens_jax, mask_tokens_numpy
from sasvqa_tpu.train.retrieval import (aggregate_clip_scores,
                                        retrieval_metrics,
                                        similarity_matrix)


def test_retrieval_metrics_perfect():
    s = np.eye(20) * 10 + np.random.default_rng(0).normal(size=(20, 20))
    m = retrieval_metrics(s)
    assert m["r1"] == 100.0
    assert m["medianR"] == 1.0


def test_retrieval_metrics_shifted():
    # ground truth always ranked 2nd -> r1=0, r5=100, MedR=2
    n = 10
    s = np.zeros((n, n))
    for i in range(n):
        s[i, i] = 5.0
        s[i, (i + 1) % n] = 10.0
    m = retrieval_metrics(s)
    assert m["r1"] == 0.0
    assert m["r5"] == 100.0
    assert m["medianR"] == 2.0


def test_score_aggregation():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    assert float(aggregate_clip_scores(x, "mean")[0]) == pytest.approx(2.0)
    assert float(aggregate_clip_scores(x, "max")[0]) == pytest.approx(3.0)
    lse = float(aggregate_clip_scores(x, "lse")[0])
    assert lse == pytest.approx(np.log(np.exp([1, 2, 3]).sum()), rel=1e-5)


def test_similarity_matrix_normalized():
    t = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)))
    v = t * 3.0  # same directions, different norms
    sim = np.asarray(similarity_matrix(t, v))
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)


@pytest.mark.parametrize("impl", ["jax", "numpy"])
def test_mlm_masking(impl):
    b, l, vocab, mask_id = 8, 64, 100, 4
    ids = np.random.default_rng(0).integers(5, vocab, size=(b, l))
    special = np.zeros((b, l), np.int32)
    special[:, 0] = 1  # CLS never masked
    if impl == "jax":
        out, labels = mask_tokens_jax(jax.random.key(0), jnp.asarray(ids),
                                      mask_id, vocab, jnp.asarray(special))
        out, labels = np.asarray(out), np.asarray(labels)
    else:
        out, labels = mask_tokens_numpy(np.random.default_rng(0), ids,
                                        mask_id, vocab, special)
    sel = labels != -100
    rate = sel.mean()
    assert 0.08 < rate < 0.25          # ~15%
    assert not sel[:, 0].any()         # special positions never selected
    # selected positions keep their original id as label
    np.testing.assert_array_equal(labels[sel], ids[sel])
    # most selected positions became [MASK]
    frac_mask = (out[sel] == mask_id).mean()
    assert 0.6 < frac_mask < 0.95
    # unselected positions unchanged
    np.testing.assert_array_equal(out[~sel], ids[~sel])


def test_timers():
    t = Timer()
    t.tic()
    _ = sum(range(1000))
    assert t.toc() >= 0

    st = StepTimer()
    with st.stage("data"):
        _ = sum(range(1000))
    with st.stage("step"):
        _ = sum(range(1000))
    s = st.summary()
    assert set(s) == {"data", "step"}
    assert s["data"]["count"] == 1

    x = jnp.ones((4,))
    assert synced(x) is x


def test_retrieval_task_end_to_end(tmp_path):
    """tasks/run_retrieval on synthetic data with a tiny CLIP."""
    import json
    from sasvqa_tpu.data.synthetic import make_synthetic_dataset
    from sasvqa_tpu.tasks.run_retrieval import main

    paths = make_synthetic_dataset(str(tmp_path / "d"), num_videos=4,
                                   stored_frames=8, img_hw=32,
                                   questions_per_video=1)
    cfg = {
        "task": "msvd_qa",
        "val_datasets": [{"name": "msvd_qa", "txt": paths["val"],
                          "img": paths["h5"]}],
        "vid_mapping": paths["vidmapping"],
        "model": {"pretrained_model": "tiny-clip", "vocab_size": 512},
        "img_size": 32, "nframe": 2, "max_txt_len": 12,
        "score_agg_func": "mean",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    metrics = main(["--config", str(p)])
    assert set(metrics) == {"r1", "r5", "r10", "medianR", "meanR"}
    assert 0 <= metrics["r1"] <= 100
