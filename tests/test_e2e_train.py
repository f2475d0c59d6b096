"""End-to-end slice: synthetic MSVD-QA -> train -> validate.

SURVEY.md §7.3: config -> annotation loader + answer vocab -> frame
store batches -> jit train_step -> validate with per-type accuracy.
Runs tiny models on the CPU mesh; exercises the full runner including
checkpointing and metrics.
"""

import json
import os

import numpy as np
import pytest

from sasvqa_tpu.data.synthetic import make_synthetic_dataset


def _write_config(tmp_path, paths, model_block, **overrides):
    cfg = {
        "task": "msvd_qa",
        "train_datasets": [{"name": "msvd_qa", "txt": paths["train"],
                            "img": paths["h5"]}],
        "val_datasets": [{"name": "msvd_qa", "txt": paths["val"],
                          "img": paths["h5"]}],
        "inference_txt_db": paths["test"],
        "inference_img_db": paths["h5"],
        "vid_mapping": paths["vidmapping"],
        "model": model_block,
        "img_size": 32,
        "nframe": 2,
        "samp_policy": "uniform",
        "max_n_example_per_group": 1,
        "train_batch_size": 2,
        "val_batch_size": 4,
        "inference_batch_size": 4,  # keep --do_inference eval shapes tiny
        "gradient_accumulation_steps": 2,
        "num_train_epochs": 1,
        "min_valid_steps": 2,
        "num_valid": 2,
        "learning_rate": 1e-4,
        "decay": "constant",
        "optim": "adamw",
        "seed": 0,
        "platform": "cpu",
        "mesh_shape": [2],
        "output_dir": str(tmp_path / "out"),
        "max_txt_len": 16,
    }
    cfg.update(overrides)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_dataset(str(root), num_videos=4, stored_frames=8,
                                  img_hw=32, questions_per_video=2)


def test_clip_end_to_end(synth, tmp_path):
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-clip", "vocab_size": 512,
         "txt_output_size": 32, "hidden_dropout_prob": 0.1})
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert result["global_step"] >= 1
    assert "overall_acc" in result["val"]
    assert "what_acc" in result["val"]  # per-answer-type metrics
    # eval snapshot actually written at the valid-step boundary
    assert (tmp_path / "out" / "ckpt").exists()
    assert len(os.listdir(tmp_path / "out" / "ckpt")) > 0


def test_zero_eval_validates_before_training(synth, tmp_path):
    """zero_eval=1 runs validation on val AND test before any training
    (reference run_video_qa.py:467-469) — zero_valid/zero_test scalars
    land in the log before the first train/loss entry."""
    import json as _json
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-clip", "vocab_size": 512,
         "txt_output_size": 32, "hidden_dropout_prob": 0.1},
        zero_eval=1)
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    scalars = [_json.loads(l) for l in
               open(tmp_path / "out" / "log" / "scalars.jsonl")]
    tags = [s["tag"] for s in scalars]
    assert any(t.startswith("zero_valid/") for t in tags)
    assert any(t.startswith("zero_test/") for t in tags)
    # zero-eval precedes the first training loss in the log stream
    assert tags.index("train/loss") > tags.index(
        next(t for t in tags if t.startswith("zero_valid/")))


def test_git_end_to_end(synth, tmp_path):
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-git", "vocab_size": 512, "img_len": 2},
        samp_policy="question-caption",
        gen_max_text_len=24, gen_max_new_tokens=6,
        n_workers=2)  # exercise the CollatorPool path end-to-end
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]


def test_git_end_to_end_u8_staging(synth, tmp_path):
    """--stage_pixels_u8: the full runner (scan-accum train + generative
    validate) with uint8 pixel wire format — collators quantize, models
    dequantize in-jit (core/pixels.py)."""
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-git", "vocab_size": 512, "img_len": 2},
        gen_max_text_len=24, gen_max_new_tokens=4,
        stage_pixels_u8=1)
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]


def test_git_e2e_tensor_parallel_mesh(synth, tmp_path):
    """--mesh_axes data model selects Megatron-TP from the CLI: the full
    runner (train + generative validate) executes on a (data=2, model=2)
    mesh with projection params actually sharded on 'model'."""
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-git", "vocab_size": 512, "img_len": 2},
        gen_max_text_len=24, gen_max_new_tokens=4,
        mesh_shape=[2, 2], mesh_axes=["data", "model"])
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]


def test_tgif_action_multiple_choice(tmp_path_factory, tmp_path):
    """TGIF-QA action MC: per-option scoring head, option-index labels."""
    from sasvqa_tpu.data.synthetic import make_synthetic_mc_dataset
    from sasvqa_tpu.tasks.run_video_qa import main
    root = tmp_path_factory.mktemp("mcdata")
    paths = make_synthetic_mc_dataset(str(root), num_videos=4,
                                      stored_frames=8, img_hw=32)
    cfg_path = _write_config(
        tmp_path, paths,
        {"pretrained_model": "tiny-clip", "vocab_size": 512})
    result = main(["--task", "action", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]
    assert "what_acc" not in result["val"]  # MC has no per-type metrics


def test_multiclip_ensemble_eval(synth, tmp_path):
    """inference_n_clips > 1: logits aggregate over clip samples with
    score_agg_func (the reference parsed these flags but never used
    them in the live loop)."""
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-clip", "vocab_size": 512},
        samp_policy="random", inference_n_clips=3, score_agg_func="lse")
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert "overall_acc" in result["val"]


def test_git_multiclip_ensemble_eval(synth, tmp_path):
    """GIT + inference_n_clips > 1: the generative path has no logits to
    pool, so eval majority-votes the per-clip decoded answers (r5,
    closing the capability gap at the old `family != 'git'` gate)."""
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-git", "vocab_size": 512, "img_len": 2},
        samp_policy="random", inference_n_clips=2,
        gen_max_text_len=24, gen_max_new_tokens=4)
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]


def test_frameqa_end_to_end(tmp_path_factory, tmp_path):
    """TGIF frameqa: JSONL annotations, open-ended 1540-way head,
    object/number/color/location answer types."""
    from sasvqa_tpu.data.synthetic import make_synthetic_frameqa_dataset
    from sasvqa_tpu.tasks.run_video_qa import main
    root = tmp_path_factory.mktemp("frameqa")
    paths = make_synthetic_frameqa_dataset(str(root))
    cfg_path = _write_config(
        tmp_path, paths,
        {"pretrained_model": "tiny-clip", "vocab_size": 512})
    result = main(["--task", "frameqa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]
    assert "color_acc" in result["val"]  # frameqa answer types


def test_git_mc_rejected(synth, tmp_path):
    """GIT + multiple-choice must fail fast with a clear error."""
    from sasvqa_tpu.data.synthetic import make_synthetic_mc_dataset
    from sasvqa_tpu.tasks.run_video_qa import main
    paths = make_synthetic_mc_dataset(str(tmp_path / "mc"))
    cfg_path = _write_config(
        tmp_path, paths, {"pretrained_model": "tiny-git",
                          "vocab_size": 512})
    with pytest.raises(ValueError, match="multiple-choice"):
        main(["--task", "action", "--config", cfg_path])


def test_blip_end_to_end(synth, tmp_path):
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-blip", "vocab_size": 512},
        samp_policy="single")
    result = main(["--task", "msvd_qa", "--config", cfg_path])
    assert np.isfinite(result["train_loss"])
    assert "overall_acc" in result["val"]


def test_inference_from_saved_snapshot(synth, tmp_path):
    """train -> snapshot -> fresh --do_inference 1 --inference_model_step N
    reproduces the in-loop validation score (the reference's ModelSaver
    load pattern, utils/load_save.py:37-62, which its live loop never
    wired up)."""
    from sasvqa_tpu.tasks.run_video_qa import main
    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-clip", "vocab_size": 512},
        num_train_epochs=4)  # 4 steps, valid/save at steps 2 and 4

    trained = main(["--task", "msvd_qa", "--config", cfg_path])
    assert trained["global_step"] == 4
    ckpt_dir = tmp_path / "out" / "ckpt"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())

    # explicit step
    inf = main(["--task", "msvd_qa", "--config", cfg_path,
                "--do_inference", "1", "--inference_model_step", "4"])
    assert inf["val"] == trained["val"], (inf["val"], trained["val"])
    # latest-snapshot default (-1)
    inf2 = main(["--task", "msvd_qa", "--config", cfg_path,
                 "--do_inference", "1"])
    assert inf2["val"] == trained["val"]
    # --inference_split honored: 'val' evaluates ONLY val (no test eval)
    # and predictions land on disk (reference configs/config.py:202-204)
    assert inf2["test"] == {}
    assert (tmp_path / "out" / "qa_results_val.json").exists()

    # 'test' split: inference-db predictions without scoring (test data
    # is assumed ground-truth-free)
    inf3 = main(["--task", "msvd_qa", "--config", cfg_path,
                 "--do_inference", "1", "--inference_split", "test"])
    assert inf3["val"] == {} and inf3["test"] == {}
    preds = json.loads(
        (tmp_path / "out" / "qa_results_test.json").read_text())
    assert preds and all("question_id" in r and "answer" in r
                         for r in preds)

    # a missing step must fail loudly, not silently eval fresh params;
    # match the step number so an unrelated early crash can't satisfy
    # the assertion
    with pytest.raises(Exception, match="99"):
        main(["--task", "msvd_qa", "--config", cfg_path,
              "--do_inference", "1", "--inference_model_step", "99"])


def test_auto_resume_from_restore_checkpoint(synth, tmp_path):
    """Preemption recovery: a second run with the same output_dir resumes
    from the restore checkpoint instead of step 0 (reference
    E2E_TrainingRestorer semantics, load_save.py:239-307)."""
    import jax
    from sasvqa_tpu.core.checkpoint import TrainingRestorer
    from sasvqa_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    from sasvqa_tpu.models.video_qa import CLIPVideoQA, ClassifierHeadConfig
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.train import steps as ts
    import jax.numpy as jnp

    tc = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                        num_layers=1, num_heads=2,
                        max_position_embeddings=8, eos_token_id=63)
    vc = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                          num_heads=2, image_size=16, patch_size=8,
                          projection_dim=16)
    model = CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=5))
    ids = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones_like(ids)
    px = jnp.zeros((2, 1, 16, 16, 3))
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px)
    cfg = ConfigDict(dict(optim="adamw", learning_rate=1e-3,
                          num_train_epochs=1, gradient_accumulation_steps=1,
                          grad_norm=-1))
    state = ts.create_train_state(model, params, cfg, total_steps=10)
    # perturb the saved params so they DIFFER from a fresh init — the
    # equality assert below must be able to fail if restore_into stops
    # loading the params payload (init is deterministic-seeded)
    state = state.replace(
        step=state.step + 7,
        params=jax.tree_util.tree_map(lambda x: x + 0.25, state.params))

    out = str(tmp_path / "resume_out")
    r1 = TrainingRestorer(out, save_steps=1)
    r1.maybe_save(7, state)
    r1.wait()
    assert r1.restore_step == 7

    # fresh restorer + fresh state: auto-resume restores step and params
    state2 = ts.create_train_state(model, params, cfg, total_steps=10)
    r2 = TrainingRestorer(out, save_steps=1)
    state2 = r2.restore_into(state2)
    assert int(state2.step) == 7
    import numpy as np
    leaf1 = jax.tree_util.tree_leaves(state.params)[0]
    leaf2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf1), np.asarray(leaf2))


def test_resume_aligns_scan_micro_counter(synth, tmp_path):
    """Scan accumulation: a resumed run picks up the MICRO counter from
    the restore checkpoint (state.step advances by K per global step)
    and trains forward instead of restarting — the alignment contract
    from train/steps.make_scan_train_step."""
    import json as _json
    from sasvqa_tpu.tasks.run_video_qa import main

    cfg_path = _write_config(
        tmp_path, synth,
        {"pretrained_model": "tiny-clip", "vocab_size": 512},
        num_train_epochs=2)   # 2 global steps of K=2 micros

    r1 = main(["--task", "msvd_qa", "--config", cfg_path])
    assert r1["global_step"] == 2

    # same output_dir + doubled epochs: restore.pt holds micro=4 ->
    # global_step resumes at 2 and runs to 4, never re-running 0-2
    r2 = main(["--task", "msvd_qa", "--config", cfg_path,
               "--num_train_epochs", "4"])
    assert r2["global_step"] == 4
    # scalars show training continued at step 3, not a restart at 1
    steps = [_json.loads(l)["step"]
             for l in (tmp_path / "out" / "log" / "scalars.jsonl")
             .read_text().splitlines() if "train/loss" in l]
    assert 3 in steps and 4 in steps
