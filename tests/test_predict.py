"""predict.py — single-video QA CLI: generative path, Orbax-classifier
path (incl. the head-shape contract with training), decode plumbing."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("predvid")
    path = str(root / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (48, 48))
    rng = np.random.default_rng(0)
    for _ in range(20):
        w.write(rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8))
    w.release()
    return path


def _args(**kw):
    from sasvqa_tpu.tasks.predict import build_argparser
    argv = []
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    return build_argparser().parse_args(argv)


def test_predict_git_generative(video_path):
    """Fresh tiny-git weights: the full decode->sample->generate path
    runs and produces a (possibly empty) string answer."""
    from sasvqa_tpu.tasks.predict import predict
    ans = predict(_args(video=video_path, question="what is moving?",
                        model="tiny-git", nframe=2, img_size=32,
                        max_length=12))
    assert isinstance(ans, str)


def test_predict_classifier_from_orbax_snapshot(video_path, tmp_path):
    """The CLI restores a trained classifier snapshot: the head shape
    (--classifier, default mlp = the training default) must make the
    param tree match the snapshot, and the answer comes from the
    ans2label vocabulary."""
    from sasvqa_tpu.core.checkpoint import ModelSaver
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model
    from sasvqa_tpu.tasks.predict import predict

    # build the EXACT model predict will construct (mlp head) and save a
    # perturbed snapshot as a stand-in for a trained run
    cfg = ConfigDict({"model": {"pretrained_model": "tiny-clip",
                                "vocab_size": None},
                      "img_size": 32, "num_labels": 5,
                      "tokenizer_dir": None, "classifier": "mlp"})
    _, model = build_model(cfg, dtype=jnp.bfloat16)
    ids = jnp.ones((1, 4), jnp.int32)
    px = jnp.zeros((1, 2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), ids,
                                 jnp.ones_like(ids), px)
    params = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    ckpt = str(tmp_path / "ckpt")
    saver = ModelSaver(ckpt)
    saver.save(3, jax.device_get(params))
    saver.wait()

    vocab = {"yes": 0, "no": 1, "cat": 2, "dog": 3, "red": 4}
    a2l = str(tmp_path / "ans2label.json")
    json.dump(vocab, open(a2l, "w"))

    ans = predict(_args(video=video_path, question="is it red?",
                        model="tiny-clip", nframe=2, img_size=32,
                        num_labels=5, ans2label=a2l, orbax_ckpt=ckpt,
                        max_length=8))
    assert ans in vocab

    # a mismatched head shape must fail loudly, not silently eval a
    # half-restored tree
    with pytest.raises(Exception):
        predict(_args(video=video_path, question="is it red?",
                      model="tiny-clip", nframe=2, img_size=32,
                      num_labels=5, ans2label=a2l, orbax_ckpt=ckpt,
                      classifier="linear", max_length=8))
