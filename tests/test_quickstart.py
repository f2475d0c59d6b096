"""Quickstart tool: generated configs must parse through the real config
system for every family (the e2e training they drive is covered by
tests/test_e2e_train.py — this stays fast)."""

import json

import pytest

from sasvqa_tpu.data.synthetic import (make_synthetic_dataset,
                                       make_synthetic_mc_dataset)
from sasvqa_tpu.tools.quickstart import build_config


@pytest.mark.parametrize("family", ["clip", "git", "mc"])
def test_quickstart_config_parses(family, tmp_path):
    root = str(tmp_path)
    if family == "mc":
        paths = make_synthetic_mc_dataset(root, num_videos=2,
                                          stored_frames=4, img_hw=16)
    else:
        paths = make_synthetic_dataset(root, num_videos=2,
                                       stored_frames=4, img_hw=16,
                                       questions_per_video=1)
    cfg_path = build_config(root, paths, family, mesh=1, epochs=1)

    from sasvqa_tpu.core.config import get_video_qa_args
    task = "action" if family == "mc" else "msvd_qa"
    cfg = get_video_qa_args(["--task", task, "--config", cfg_path])
    assert cfg.task == task
    assert cfg.train_datasets[0].txt == paths["train"]
    expected = "tiny-git" if family == "git" else "tiny-clip"
    assert cfg.model.pretrained_model == expected
    # label floors applied by the task fixup (reference
    # configs/config.py:320-331 semantics)
    if family != "mc":
        assert cfg.num_labels >= 1000


def test_quickstart_config_json_is_valid(tmp_path):
    paths = make_synthetic_dataset(str(tmp_path), num_videos=2,
                                   stored_frames=4, img_hw=16,
                                   questions_per_video=1)
    p = build_config(str(tmp_path), paths, "clip", mesh=2, epochs=3)
    cfg = json.load(open(p))
    assert cfg["mesh_shape"] == [2]
    assert cfg["num_train_epochs"] == 3
