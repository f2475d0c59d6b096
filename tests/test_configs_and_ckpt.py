"""Shipped configs parse + build; checkpoint roundtrips; mismatch loads."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REPO, "configs", "*.json"))))
def test_shipped_configs_parse_and_build(path):
    """Every configs/*.json goes through the CLI parser and constructs
    its (full-size) model object — catches schema drift."""
    from sasvqa_tpu.core.config import get_video_qa_args
    from sasvqa_tpu.models.presets import build_model

    cfg = get_video_qa_args(["--config", path])
    assert cfg.task in ("msvd_qa", "msrvtt_qa")
    assert cfg.train_datasets[0].txt
    family, model = build_model(cfg)
    assert family in ("clip", "blip", "git")
    # knob sanity vs BASELINE.md table
    assert cfg.train_batch_size * cfg.gradient_accumulation_steps >= 32


@pytest.mark.skipif(not os.path.isdir("/root/reference/src/configs"),
                    reason="reference mount not available")
def test_shipped_configs_match_reference_knobs():
    """Training-relevant knob values must equal the reference configs
    (case-insensitive for optimizer names).  Deliberate divergences:
    output paths, dead keys (detectron2/BGR/cnn_* — vestigial ClipBERT),
    fp16 (we run bf16), and msrvtt_qa_base's typo'd 'decay_epocs' which
    we translate to step_decay_epochs (the reference's literal config
    crashes MultiStepLR with milestones=None)."""
    import json
    keys = ["train_batch_size", "gradient_accumulation_steps", "nframe",
            "samp_policy", "img_size", "learning_rate",
            "num_train_epochs", "max_txt_len", "decay", "optim", "seed",
            "weight_decay", "num_valid", "min_valid_steps", "gamma",
            "max_n_example_per_group", "val_batch_size",
            "inference_batch_size"]
    norm = lambda v: str(v).lower() if isinstance(v, str) else v
    for path in sorted(glob.glob(os.path.join(REPO, "configs", "*.json"))):
        name = os.path.basename(path)
        ref_path = f"/root/reference/src/configs/{name}"
        if not os.path.exists(ref_path):
            continue
        ref = json.load(open(ref_path))
        ours = json.load(open(path))
        for k in keys:
            if k not in ref:
                continue
            assert norm(ours.get(k)) == norm(ref[k]), (name, k, ref[k],
                                                       ours.get(k))


def test_shipped_configs_have_distinct_output_dirs():
    """Regression: the six shipped configs must not share output_dirs —
    the launch scripts rm -rf them on train, so a shared dir let one
    config's run destroy another's checkpoints (the reference keeps
    them distinct: saved_models/msvd_qa_001/2/3 etc.)."""
    import json
    dirs = {}
    for path in sorted(glob.glob(os.path.join(REPO, "configs", "*.json"))):
        out = json.load(open(path))["output_dir"]
        assert out not in dirs.values(), (path, out)
        dirs[path] = out


def test_model_saver_roundtrip(tmp_path):
    from sasvqa_tpu.core.checkpoint import ModelSaver

    params = {"w": jnp.arange(12.0).reshape(3, 4),
              "nested": {"b": jnp.ones((5,))}}
    saver = ModelSaver(str(tmp_path / "ckpt"))
    saver.save(3, jax.device_get(params))
    saver.save(7, jax.device_get(
        jax.tree_util.tree_map(lambda x: x * 2, params)))
    saver.wait()
    assert saver.latest_step() == 7
    restored = saver.restore(7, template=jax.device_get(params))
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.arange(12.0).reshape(3, 4) * 2)
    restored3 = saver.restore(3, template=jax.device_get(params))
    np.testing.assert_allclose(np.asarray(restored3["nested"]["b"]),
                               np.ones((5,)))
    saver.close()


def test_merge_pretrained_mismatch_tolerance():
    """Shape-tolerant partial loading with a key-diff report
    (reference load_state_dict_with_mismatch, load_save.py:65-94)."""
    from sasvqa_tpu.models.convert import merge_pretrained

    init = {"a": jnp.zeros((2, 2)),
            "head": {"kernel": jnp.zeros((4, 10))},
            "extra": jnp.zeros((3,))}
    ckpt = {"a": np.ones((2, 2)),
            "head": {"kernel": np.ones((4, 999))}}  # mismatched classifier
    merged, report = merge_pretrained(init, ckpt)
    np.testing.assert_allclose(np.asarray(merged["a"]), 1.0)
    # mismatched leaf keeps its init value and is reported
    np.testing.assert_allclose(np.asarray(merged["head"]["kernel"]), 0.0)
    assert any("head/kernel" in m for m in report["mismatched"])
    assert any("extra" in m for m in report["missing_in_ckpt"])
    assert any("/a" in m for m in report["loaded"])
