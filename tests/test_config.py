"""Config precedence tests (CLI > JSON > argparse default).

Mirrors reference semantics at src/configs/config.py:12-29.
"""

import json

from sasvqa_tpu.core.config import (ConfigDict, get_video_qa_args,
                                    load_config)


def _write_cfg(tmp_path, extra=None):
    cfg = {
        "task": "msvd_qa",
        "train_batch_size": 6,
        "gradient_accumulation_steps": 72,
        "nframe": 1,
        "samp_policy": "uniform",
        "model": {
            "pretrained_model": "microsoft/git-base-msrvtt-qa",
            "txt_output_size": 768,
            "img_len": 6,
        },
        "train_datasets": [{"name": "msvd_qa", "txt": "/x/qa_train.json",
                            "img": "/x/feat.h5"}],
    }
    cfg.update(extra or {})
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_json_overrides_default(tmp_path):
    path = _write_cfg(tmp_path)
    cfg = get_video_qa_args(["--config", path])
    assert cfg.train_batch_size == 6
    assert cfg.gradient_accumulation_steps == 72
    assert cfg.samp_policy == "uniform"


def test_cli_overrides_json(tmp_path):
    path = _write_cfg(tmp_path)
    cfg = get_video_qa_args(
        ["--config", path, "--train_batch_size", "99"])
    assert cfg.train_batch_size == 99  # CLI wins
    assert cfg.gradient_accumulation_steps == 72  # JSON still applies


def test_nested_attribute_access(tmp_path):
    path = _write_cfg(tmp_path)
    cfg = get_video_qa_args(["--config", path])
    assert cfg.model.pretrained_model == "microsoft/git-base-msrvtt-qa"
    assert cfg.train_datasets[0].txt == "/x/qa_train.json"


def test_task_label_floors(tmp_path):
    # msvd_qa/msrvtt_qa floor 1000, frameqa floor 1540, MC tasks 5
    # (reference: src/configs/config.py:320-331)
    for task, expected in [("msvd_qa", 1000), ("msrvtt_qa", 1000),
                           ("frameqa", 1540), ("action", 5),
                           ("transition", 5)]:
        cfg = get_video_qa_args(["--task", task])
        assert cfg.num_labels == expected
        assert cfg.loss_type == "ce"


def test_bool_coercion(tmp_path):
    cfg = get_video_qa_args(["--task", "msvd_qa", "--debug", "1",
                             "--fp16", "1"])
    assert cfg.debug is True
    assert cfg.fp16 is True
    # the falsy case is the one type=bool would get wrong
    # (bool("0") is True) — it must coerce to False
    cfg = get_video_qa_args(["--task", "msvd_qa", "--debug", "0",
                             "--fp16", "0"])
    assert cfg.debug is False
    assert cfg.fp16 is False


def test_configdict_mutation_and_to_dict():
    cd = ConfigDict({"a": {"b": 1}})
    cd.c = {"d": 2}
    assert cd.c.d == 2
    plain = cd.to_dict()
    assert type(plain["a"]) is dict


def test_load_config(tmp_path):
    path = _write_cfg(tmp_path)
    cfg = load_config(path, seed=7)
    assert cfg.seed == 7
    assert cfg.model.img_len == 6


def test_abbreviated_flags_rejected(tmp_path):
    """allow_abbrev=False: an abbreviated flag (--train_batch for
    --train_batch_size) must be rejected, because argparse would accept
    it while parse_with_config's argv scan records only the abbreviated
    spelling — letting the JSON silently beat the explicit CLI value
    and inverting the documented CLI > JSON precedence (r3 review
    finding)."""
    import pytest
    path = _write_cfg(tmp_path)
    with pytest.raises(SystemExit):
        get_video_qa_args(["--config", path, "--train_batch", "99"])
