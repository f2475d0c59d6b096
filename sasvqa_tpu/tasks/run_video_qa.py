"""Video-QA training/eval entry point (MSVD-QA / MSRVTT-QA / TGIF-QA).

TPU-native rebuild of src/tasks/run_video_qa.py:

    python -m sasvqa_tpu.tasks.run_video_qa --task msvd_qa \
        --config configs/msvd_qa_tiny.json

Same config files drive it (train_datasets/val_datasets/model blocks,
samp_policy, nframe, batch/accum, decay, ...).  Step math, validation
cadence, answer-vocab construction and metrics all mirror the reference
(:390-531); the compute path is jit over a device mesh with bf16
activations.

Deliberate fixes vs reference quirks (SURVEY.md §7.4 item 7):
- ``flag_prtr`` NameError for non-GIT models (:396-406) -> family
  dispatch handles all three;
- classification validate's ``pred_labels_str`` NameError (:332) ->
  answer_str only emitted on the generative path;
- scheduler stepping is driven by global_step milestones rather than
  validation blocks (:524-525) — documented in train/schedules.py.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sasvqa_tpu.core.checkpoint import (ModelSaver, TrainingRestorer,
                                        save_training_meta)
from sasvqa_tpu.core.config import get_video_qa_args
from sasvqa_tpu.core.logging import (LOGGER, TB_LOGGER, RunningMeter,
                                     add_log_to_file)
from sasvqa_tpu.core.rng import set_random_seed
from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                         evaluate_qa, group_datalist,
                                         load_datalist)
from sasvqa_tpu.data.dataset import (ClassifierCollator, GITCollator,
                                     VideoQADataset, make_collator)
from sasvqa_tpu.data.frame_store import FrameStoreReader, load_vidmapping
from sasvqa_tpu.data.pipeline import DevicePrefetcher, infinite_batches
from sasvqa_tpu.data.tokenization import (CLIPBPETokenizer,
                                          WordPieceTokenizer,
                                          make_test_wordpiece)
from sasvqa_tpu.models.presets import build_model, load_pretrained_params
from sasvqa_tpu.parallel.mesh import make_mesh
from sasvqa_tpu.train import steps as train_steps
from sasvqa_tpu.utils.basic import get_rounded_percentage


def build_tokenizer(cfg, family: str):
    tok_dir = cfg.get("tokenizer_dir")
    if tok_dir:
        vocab_txt = os.path.join(tok_dir, "vocab.txt")
        vocab_json = os.path.join(tok_dir, "vocab.json")
        merges = os.path.join(tok_dir, "merges.txt")
        if family == "clip" and os.path.exists(vocab_json):
            return CLIPBPETokenizer.from_files(vocab_json, merges)
        if os.path.exists(vocab_txt):
            return WordPieceTokenizer.from_vocab_file(vocab_txt)
        raise FileNotFoundError(f"no vocab files under {tok_dir}")
    LOGGER.warning("no tokenizer_dir configured; using the built-in test "
                   "WordPiece vocab (synthetic runs only)")
    return make_test_wordpiece()


def setup_datasets(cfg, ans2label):
    def make(split_cfg_txt, img, is_train, return_label=True):
        datalist = load_datalist(cfg.task, split_cfg_txt,
                                 data_ratio=cfg.data_ratio if is_train else 1.0)
        grouped = group_datalist(
            datalist,
            max_n_example_per_group=cfg.max_n_example_per_group,
            is_train=is_train)
        return VideoQADataset(
            cfg.task, grouped, FrameStoreReader(img),
            load_vidmapping(cfg.vid_mapping), ans2label,
            return_label=return_label, is_train=is_train)

    train = make(cfg.train_datasets[0].txt, cfg.train_datasets[0].img, True)
    # reference quirk kept: val reuses the train h5 (run_video_qa.py:220)
    val = make(cfg.val_datasets[0].txt, cfg.train_datasets[0].img, False)
    test = make(cfg.inference_txt_db, cfg.inference_img_db, False)
    return train, val, test


def decode_answers(tokenizer, generated: np.ndarray,
                   ans2label) -> (List[int], List[str]):
    """Generated ids -> last-word answer -> label
    (reference run_video_qa.py:325-326)."""
    preds, strs = [], []
    for row in generated:
        text = tokenizer.decode(row, skip_special_tokens=True).strip()
        strs.append(text)
        word = text.split()[-1] if text.split() else ""
        preds.append(ans2label.get(word, -1))
    return preds, strs


def validate(state, dataset, collator, cfg, family, tokenizer, ans2label,
             eval_step, mesh, eval_score: bool = True,
             tag: str = "valid", n_options: int = 0,
             logits_step=None) -> Dict[str, Any]:
    """Evaluation loop (reference validate, run_video_qa.py:283-387).

    Multi-host correct: every process walks the IDENTICAL global batch
    plan (``eval_batch_plan`` — each batch index list tiled to exactly
    ``global_bs``, so eval compiles ONCE), collates only its contiguous
    per-host row block, and the jitted eval step runs SPMD over the
    global mesh (``shard_batch`` assembles the global batch from
    process-local shards, exactly as training does).  The tiny
    per-batch outputs — pred labels / generated token ids / logit rows,
    never activations — are replicated back to every host
    (``fetch_replicated``), so all processes build identical qa_results
    and scores.  This is the modern equivalent of the reference's
    intended per-rank result shards merged by rank 0
    (run_video_retrieval.py:698-724), without the filesystem
    round-trip.  Assumes the mesh enumerates devices in process order
    (make_mesh over jax.devices() does) — the same assumption the
    training path's shard_batch makes.

    Eval-time 'random'-policy frame draws are seeded per (group, clip)
    (see clip_rngs below), so the SAME checkpoint scores identically
    regardless of process count, eval batch size, or plan padding —
    proven by tests/test_multihost_eval.py (2-process vs 1-process,
    samp_policy='random') and the batch-size-invariance test there.
    """
    st = time.time()
    qa_results = []
    n_ex = 0
    pc = jax.process_count()
    pi = jax.process_index() if pc > 1 else 0
    n_dev = mesh.devices.size if mesh is not None else 1
    # reference: --do_inference evaluates at inference_batch_size; normal
    # validation at val_batch_size (run_video_qa.py:154-157)
    eval_bs = int(cfg.inference_batch_size if cfg.get("do_inference")
                  else cfg.val_batch_size)
    # fixed global batch: a multiple of n_dev shards evenly and covers
    # the per-host split too (hosts hold equal device counts)
    global_bs = -(-max(eval_bs, n_dev) // n_dev) * n_dev
    assert global_bs % pc == 0, (global_bs, pc)
    if pc > 1:
        # this host's rows of every global eval batch, from the batch
        # sharding itself (replica rows when hosts straddle a non-data
        # mesh axis; disjoint contiguous blocks otherwise)
        from sasvqa_tpu.parallel.mesh import host_batch_positions
        eval_positions = host_batch_positions(mesh, global_bs)
    else:
        eval_positions = np.arange(global_bs)
    # deterministic eval-time frame sampling: 'random'-policy draws are
    # seeded per (group, clip) — NOT one sequential stream — so a row's
    # frames depend only on its own identity.  Eval scores are therefore
    # invariant to process count, batch size, and plan padding (a tiled
    # padding row repeats the real row's draws); a shared stream would
    # advance differently per topology and per plan.
    def clip_rngs(idx, clip: int):
        return [np.random.default_rng((cfg.seed, int(i), clip))
                for i in idx]
    # multi-clip ensemble eval: classifiers aggregate logits over n
    # independent frame samples per video (score_agg_func,
    # configs/config.py:99-101 — set by every live JSON, read by no
    # live loop); the generative GIT path has no logits to pool, so it
    # majority-votes the per-clip decoded answers instead (ties ->
    # first clip, deterministic)
    ensemble = 1 if n_options else int(cfg.get("inference_n_clips", 1))
    if family != "git" and not logits_step:
        ensemble = 1

    from sasvqa_tpu.data.pipeline import DevicePrefetcher, eval_batch_plan
    from sasvqa_tpu.parallel.mesh import fetch_replicated, shard_batch

    def stage(batch):
        # single source of truth for host-only keys: the training
        # prefetcher's contract (a new host key added there must not
        # leak into the jitted eval batch here)
        for k in DevicePrefetcher.HOST_KEYS:
            batch.pop(k, None)
        arrays = {k: v for k, v in batch.items() if v is not None}
        if mesh is not None:
            arrays = shard_batch(arrays, mesh)
        return arrays

    def dispatch(idx_p, n_real_groups):
        """Host prep + async device dispatch for one planned batch.

        Returns (gqids, n_real, device_out) with device_out still in
        flight — jax dispatch is async, so the device computes this
        batch while the host consumes the PREVIOUS one (the eval
        analogue of the train loop's no-per-step-sync discipline)."""
        # global question ids + real-example count from datalist
        # METADATA only — no frame IO for other hosts' rows; tiled
        # padding groups sit at the END of idx_p, so the first n_real
        # output rows are exactly the real examples
        gqids = [e["question_id"] for i in idx_p
                 for e in dataset.datalist[int(i)][1]]
        n_real = sum(len(dataset.datalist[int(i)][1])
                     for i in idx_p[:n_real_groups])
        local_idx = idx_p[eval_positions]
        # one HDF5 read per video for ALL clips — and one get_group
        # outcome: its random-substitution-on-error would otherwise
        # pick DIFFERENT videos per clip
        items = [dataset.get_group(int(i)) for i in local_idx]
        raw = collator(items, rng=clip_rngs(local_idx, 0))
        # positional attribution contract: collated order must match the
        # batch plan (get_group never substitutes groups in eval mode —
        # data/dataset.py — so a mismatch here is a plumbing bug)
        expected = [e["question_id"] for i in local_idx
                    for e in dataset.datalist[int(i)][1]]
        assert raw.get("question_ids") == expected, \
            "eval prediction attribution drift"
        batch = stage(raw)
        if family == "git":
            dev = eval_step(state, batch)
            if ensemble > 1:
                # per-clip generations; answer voting happens host-side
                # in consume (no logits to pool on the generative path)
                dev = [dev] + [
                    eval_step(state, stage(collator(
                        items, rng=clip_rngs(local_idx, c))))
                    for c in range(1, ensemble)]
        elif ensemble > 1:
            # extra clips re-run only the collator on the items read
            # above (frame re-sampling lives in the collator)
            dev = [logits_step(state, batch)]
            for c in range(1, ensemble):
                b2 = stage(collator(items, rng=clip_rngs(local_idx, c)))
                dev.append(logits_step(state, b2))
        else:
            dev, _ = eval_step(state, batch)
        return gqids, n_real, dev

    def consume(pending):
        """Fetch + decode one dispatched batch — the host half of the
        pipeline, running while the device computes the next batch."""
        nonlocal n_ex
        gqids, n_real, dev = pending
        if family == "git":
            if isinstance(dev, list):  # multi-clip answer voting
                from collections import Counter
                per_clip = [decode_answers(
                    tokenizer, fetch_replicated(d, mesh)[:n_real],
                    ans2label) for d in dev]
                for i, qid in enumerate(gqids[:n_real]):
                    votes = [preds[i] for preds, _ in per_clip]
                    # Counter.most_common keeps first-seen order on
                    # ties -> clip 0 wins deterministically
                    lbl = Counter(votes).most_common(1)[0][0]
                    s = next(strs[i] for preds, strs in per_clip
                             if preds[i] == lbl)
                    qa_results.append(dict(question_id=qid, answer=lbl,
                                           answer_str=s,
                                           data=dataset.qid2data[qid]))
            else:
                generated = fetch_replicated(dev, mesh)
                preds, strs = decode_answers(tokenizer,
                                             generated[:n_real],
                                             ans2label)
                for qid, p, s in zip(gqids, preds, strs):
                    qa_results.append(dict(question_id=qid, answer=p,
                                           answer_str=s,
                                           data=dataset.qid2data[qid]))
        elif ensemble > 1:
            from sasvqa_tpu.train.retrieval import aggregate_clip_scores
            all_logits = [fetch_replicated(d, mesh)[:n_real] for d in dev]
            agg = aggregate_clip_scores(
                jnp.asarray(np.stack(all_logits, axis=-1)),
                cfg.get("score_agg_func", "mean"))
            preds = np.asarray(jnp.argmax(agg, axis=-1)).tolist()
            for qid, p in zip(gqids, preds):
                qa_results.append(dict(question_id=qid, answer=int(p),
                                       data=dataset.qid2data[qid]))
        else:
            preds = fetch_replicated(dev, mesh)[:n_real].tolist()
            for qid, p in zip(gqids, preds):
                qa_results.append(dict(question_id=qid, answer=int(p),
                                       data=dataset.qid2data[qid]))
        n_ex += n_real

    # ONE batch in flight: dispatch batch i, then consume batch i-1, so
    # host collation + answer decoding overlap device compute instead of
    # serialising with it (the old loop fetched each batch's output
    # right after dispatching it, idling the device during every
    # collate/decode).  Multi-host ordering is untouched — every process
    # walks the same global plan and consumes in dispatch order.
    in_flight = None
    for b_idx, (idx_p, n_real_groups) in enumerate(
            eval_batch_plan(len(dataset), global_bs)):
        cur = dispatch(idx_p, n_real_groups)
        if in_flight is not None:
            consume(in_flight)
        in_flight = cur
        if cfg.debug and b_idx >= 5:
            break
    if in_flight is not None:
        consume(in_flight)

    val_log: Dict[str, Any] = {}
    gathered: Dict[str, Any] = {}
    if eval_score and qa_results:
        scores = evaluate_qa(qa_results, dataset.qid2data, ans2label,
                             cfg.task)
        if "ratios" in scores:
            gathered["ratios"] = {
                k: [get_rounded_percentage(v[1] / max(n_ex, 1)), v[1]]
                for k, v in scores["ratios"].items()}
        for k, v in scores.items():
            if k == "ratios" or "ratio" in k:
                continue
            gathered[k] = get_rounded_percentage(v)
            val_log[f"{tag}/{k}"] = gathered[k]
    TB_LOGGER.log_scalar_dict(val_log)
    LOGGER.info(f"[{tag}] {n_ex} examples in {time.time() - st:.1f}s: "
                f"{gathered}")
    return {"qa_results": qa_results, "scores": gathered}


def start_training(cfg) -> Dict[str, Any]:
    if cfg.get("platform") == "cpu":
        # --platform cpu must also move the DEFAULT device, and must do
        # so BEFORE any jax dispatch (set_random_seed runs
        # jax.random.key on the default backend): the mesh alone only
        # places mesh-sharded arrays, and the axon TPU plugin ignores
        # JAX_PLATFORMS=cpu, so in-process forcing is the only reliable
        # switch (CLAUDE.md hazard).  A late switch would still attach
        # a second TPU client from a "cpu" smoke run — able to perturb
        # a concurrent real-chip job.  Must be a LOCAL device: under
        # jax.distributed, jax.devices("cpu")[0] is process 0's device,
        # non-addressable from other tasks — a worker that defaults to
        # it dies at its first dispatch and the survivors hang in
        # collectives until the shutdown-barrier deadline.
        jax.config.update("jax_default_device",
                          jax.local_devices(backend="cpu")[0])
    key, host_rng = set_random_seed(cfg.seed)
    is_mc = cfg.task in ("action", "transition")

    if is_mc:
        # MC answers are option indices; identity label map
        ans2label = {i: i for i in range(cfg.num_labels)}
    elif cfg.get("ans2label_path"):
        # precomputed vocab (frameqa's 1540-answer file, config.py:305)
        from sasvqa_tpu.utils.basic import load_json as _lj
        ans2label = _lj(cfg.ans2label_path)
    else:
        # answer vocab from the train split, k=1000 (run_video_qa.py:205-208)
        anno_files = (cfg.train_datasets[0].txt,)
        ans2label = build_common_answer_dict(anno_files, 1000)

    if not is_mc and len(ans2label) > cfg.num_labels:
        # must not be silent: label indices >= num_labels would clamp
        # inside the jitted CE gather (take_along_axis clips out-of-
        # bounds under jit), training every overflow answer against the
        # last logit (r3 review finding; the reference's fixed-1000
        # head would throw torch device asserts on the same input).
        # num_labels is task-derived, not a flag — grow it to fit.
        LOGGER.warning(
            f"answer vocabulary ({len(ans2label)} entries, "
            f"ans2label_path) exceeds the task's num_labels floor "
            f"({cfg.num_labels}); growing the classifier to "
            f"{len(ans2label)} outputs")
        cfg.num_labels = len(ans2label)

    dtype = jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32
    family, model = build_model(cfg, dtype=dtype)
    if is_mc and family == "git":
        raise ValueError(
            "action/transition multiple-choice requires a clip/blip "
            "model; the GIT generative path has no MC scoring head")
    tokenizer = build_tokenizer(cfg, family)

    train_ds, val_ds, test_ds = setup_datasets(cfg, ans2label)

    mesh = make_mesh(shape=cfg.get("mesh_shape"), axes=cfg.get("mesh_axes"),
                     platform=cfg.get("platform"))
    n_dev = mesh.devices.size
    LOGGER.info(f"mesh: {mesh}")

    # step math (run_video_qa.py:424-435)
    total_n_examples = len(train_ds) * cfg.max_n_example_per_group
    total_train_batch_size = int(n_dev * cfg.train_batch_size
                                 * cfg.gradient_accumulation_steps
                                 * cfg.max_n_example_per_group)
    cfg.num_train_steps = int(math.ceil(
        1.0 * cfg.num_train_epochs * total_n_examples
        / total_train_batch_size))
    cfg.valid_steps = max(int(math.ceil(
        1.0 * cfg.num_train_steps / cfg.num_valid
        / cfg.min_valid_steps)) * cfg.min_valid_steps, 1)

    # init + optional local pretrained overlay
    collator = make_collator(family, tokenizer, cfg)
    probe = collator([train_ds.get_group(0)], rng=host_rng)
    init_args = (jnp.asarray(probe["text_input_ids"]),
                 jnp.asarray(probe["text_attention_mask"]),
                 jnp.asarray(probe["visual_inputs"]))
    if is_mc:
        params = jax.jit(lambda k, i, a, p: model.init(
            k, i, a, p, cfg.num_labels, method="multiple_choice"))(
            key, *init_args)
    else:
        params = jax.jit(model.init)(key, *init_args)
    weights_path = cfg.model.get("pretrained_weights")
    if weights_path:
        params = load_pretrained_params(family, model, params, weights_path)

    # fsdp/model mesh axes shard the params (ZeRO / Megatron-TP,
    # parallel/mesh.param_sharding_for_mesh); optimizer moments inherit
    # the layout because optax init zeros_like-s the sharded params
    from sasvqa_tpu.parallel.mesh import param_sharding_for_mesh
    p_shard = param_sharding_for_mesh(params, mesh)
    if p_shard is not None:
        # single device_put call: a per-leaf tree_map would issue one
        # host round-trip per leaf (~34 ms each over a tunneled chip)
        params = jax.device_put(params, p_shard)

    state = train_steps.create_train_state(
        model, params, cfg, total_steps=cfg.num_train_steps)

    output_dir = cfg.get("output_dir") or "output/run"
    os.makedirs(output_dir, exist_ok=True)
    # host-side observability is primary-process-only on a pod: every
    # process computing identical global metrics would interleave
    # duplicate rows into one shared scalars.jsonl / args.json (the
    # reference gates the same way via NoOp on non-main ranks,
    # src/utils/misc.py:26-31).  Checkpoint saves below stay COLLECTIVE
    # — orbax requires every process to participate.
    if jax.process_index() == 0:
        save_training_meta(output_dir, cfg)
        TB_LOGGER.create(os.path.join(output_dir, "log"))
        add_log_to_file(os.path.join(output_dir, "log", "log.txt"))
    else:
        add_log_to_file(os.path.join(
            output_dir, "log", f"log.host{jax.process_index()}.txt"))
    saver = ModelSaver(os.path.join(output_dir, "ckpt"))
    restorer = TrainingRestorer(
        output_dir,
        save_steps=max(int(cfg.save_steps_ratio * cfg.num_train_steps
                           * cfg.gradient_accumulation_steps), 1))
    resumed = restorer.restore_step > 0
    state = restorer.restore_into(state)
    if resumed or jax.process_count() > 1:
        # orbax restores every leaf COMMITTED to its template sharding;
        # scalar/opt leaves come back committed to ONE device, and jit
        # refuses to mix them with batches sharded across the mesh
        # ("incompatible devices", caught by
        # tests/test_e2e_train.py::test_resume_aligns_scan_micro_counter).
        # Re-place: leaves that carry a mesh sharding (TP/fsdp params)
        # keep it; everything else replicates over the mesh.
        # Multi-host needs the same treatment on FRESH runs too: the
        # deterministic-seeded init and state scalars are process-local
        # arrays, and multi-controller jit only accepts GLOBAL arrays —
        # each process contributes its identical copy to the replicated
        # layout (proven by tests/test_multihost_train.py).
        from jax.sharding import NamedSharding
        from sasvqa_tpu.parallel.mesh import replicated
        rep = replicated(mesh)

        def replace(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding):
                return jax.device_put(x, sh)
            if jax.process_count() > 1 and isinstance(x, jax.Array):
                # a COMMITTED local array (orbax restore, eager init)
                # can't be device_put across hosts ("does not support
                # cross-host device transfers"); every process holds the
                # identical value, so move the DATA via host — each
                # process fills its addressable shards of the global
                # replicated layout (caught by the 2-process resume
                # test, tests/test_multihost_train.py)
                x = np.asarray(x)
            return jax.device_put(x, rep)

        state = jax.tree_util.tree_map(replace, state)

    # --do_inference evaluates a trained eval snapshot: restore
    # ckpt/model_step_{N} (or the latest one) into state.params.  This is
    # the working equivalent of the reference's ModelSaver loads
    # (utils/load_save.py:37-62; the reference's own --do_inference was a
    # no-op and its snapshot-loading eval lived only on dead paths,
    # run_video_retrieval.py:693-724).
    if cfg.do_inference:
        step_req = int(cfg.get("inference_model_step", -1) or -1)
        target = step_req if step_req > 0 else saver.latest_step()
        if target is None:
            LOGGER.warning("inference mode without a saved snapshot: "
                           "evaluating fresh/pretrained-overlay params")
        else:
            LOGGER.info(f"inference: restoring eval snapshot "
                        f"model_step_{target} from {saver.dir}")
            loaded = saver.restore(int(target), template=state.params)
            # restored leaves are committed to one device; re-place them
            # with the mesh's param sharding (replicated for data-only)
            from sasvqa_tpu.parallel.mesh import replicated
            loaded = jax.device_put(
                loaded, p_shard if p_shard is not None
                else replicated(mesh))
            state = state.replace(params=loaded)

    # scan accumulation (default): one jitted call = K stacked micros +
    # ONE optimizer update; --scan_accum 0 falls back to per-micro calls
    # through optax.MultiSteps (train/steps.make_scan_train_step doc)
    accum = int(cfg.gradient_accumulation_steps)
    use_scan = accum > 1 and bool(cfg.get("scan_accum", 1))
    gmean = bool(cfg.get("accum_grad_mean", 1))

    if is_mc:
        train_step = (train_steps.make_scan_train_step(
            accum, "mc", n_options=cfg.num_labels, mesh=mesh,
            grad_mean=gmean)
            if use_scan
            else train_steps.make_mc_train_step(cfg.num_labels, mesh))
        eval_step = train_steps.make_mc_eval_step(cfg.num_labels, mesh)
        eval_collator = collator
    elif family == "git":
        train_step = (train_steps.make_scan_train_step(accum, "git",
                                                       mesh=mesh,
                                                       grad_mean=gmean)
                      if use_scan else train_steps.make_git_train_step(mesh))
        # default budget = the reference's generate(max_length=50)-total
        # semantics (modeling.py:333): max_new defaults to max_text_len-1
        # inside greedy_generate; the while_loop early-exits when every
        # row is done, so the bigger static budget costs nothing extra
        eval_step = train_steps.make_git_eval_step(
            model, max_text_len=cfg.get("gen_max_text_len", 50),
            max_new_tokens=cfg.get("gen_max_new_tokens"), mesh=mesh)
        from sasvqa_tpu.data.dataset import pixel_dtype_for
        eval_collator = GITCollator(
            tokenizer, max_txt_len=cfg.max_txt_len,
            max_seq_len=cfg.get("max_seq_len", cfg.max_txt_len + 12),
            task_type=cfg.task, nframe=cfg.nframe,
            samp_policy=cfg.samp_policy, add_ans=False,
            pixel_dtype=pixel_dtype_for(cfg))
    else:
        train_step = (train_steps.make_scan_train_step(
            accum, "classifier", mesh=mesh, grad_mean=gmean)
            if use_scan else train_steps.make_classifier_train_step(mesh))
        eval_step = train_steps.make_classifier_eval_step(mesh)
        eval_collator = collator

    LOGGER.info(f"***** training: {cfg.num_train_steps} steps, validate "
                f"every {cfg.valid_steps}, {n_dev} devices *****")

    n_opt = cfg.num_labels if is_mc else 0
    logits_step = None
    if family != "git" and not is_mc \
            and int(cfg.get("inference_n_clips", 1)) > 1:
        logits_step = train_steps.make_classifier_logits_step(mesh)

    def run_validation(tag_prefix=""):
        if cfg.do_inference:
            # --inference_split selects the ONE split inference
            # evaluates (reference configs/config.py:202-204: "val" has
            # ground truth; "test*" data may come without — emit
            # predictions but skip scoring for test*)
            split = str(cfg.get("inference_split", "val"))
            ds = val_ds if split == "val" else test_ds
            res = validate(state, ds, eval_collator, cfg, family,
                           tokenizer, ans2label, eval_step, mesh,
                           eval_score=not split.startswith("test"),
                           tag=f"{tag_prefix}{split}", n_options=n_opt,
                           logits_step=logits_step)
            # predictions always land on disk in inference mode (the
            # reference's intended submission-file pattern,
            # run_video_retrieval.py:698-724, modernized to one file)
            from sasvqa_tpu.utils.basic import save_json
            save_json([{k: v for k, v in r.items() if k != "data"}
                       for r in res["qa_results"]],
                      os.path.join(output_dir,
                                   f"qa_results_{split}.json"))
            empty = {"qa_results": [], "scores": {}}
            return (res, empty) if split == "val" else (empty, res)
        res_v = validate(state, val_ds, eval_collator, cfg, family,
                         tokenizer, ans2label, eval_step, mesh,
                         tag=f"{tag_prefix}valid", n_options=n_opt,
                         logits_step=logits_step)
        res_t = validate(state, test_ds, eval_collator, cfg, family,
                         tokenizer, ans2label, eval_step, mesh,
                         tag=f"{tag_prefix}test", n_options=n_opt,
                         logits_step=logits_step)
        return res_v, res_t

    if cfg.get("zero_eval"):
        run_validation("zero_")

    # preemption handling: on SIGTERM/SIGINT finish the current step, save
    # the restore checkpoint, then exit (TPU-VM preemption semantics;
    # replaces the reference's save_steps_ratio-only coverage, SURVEY §5.3)
    import signal
    preempted = {"flag": False}

    def _on_signal(signum, frame):
        LOGGER.warning(f"signal {signum}: checkpointing for preemption")
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (tests)
            pass

    running_loss = RunningMeter("train_loss")
    dropout_key = jax.random.fold_in(key, 1)
    if jax.process_count() > 1:
        # fold_in commits its result to one local device; multi-controller
        # jit needs a global array (same seed everywhere -> same key, so
        # replication is value-correct).  Typed key arrays can't cross
        # the addressability boundary in device_put — move the raw key
        # DATA and re-wrap (found by tests/test_multihost_train.py).
        from sasvqa_tpu.parallel.mesh import replicated
        dropout_key = jax.random.wrap_key_data(jax.device_put(
            np.asarray(jax.random.key_data(dropout_key)),
            replicated(mesh)))
    start_micro = int(state.step)  # single host fetch before the hot loop
    global_step = start_micro // cfg.gradient_accumulation_steps
    last_saved_step = -1
    total_correct = total_preds = 0
    last_scores: Dict[str, Any] = {}
    micro = 0
    debug_cap = 3
    log_every = 10

    # Device-throughput discipline: the hot loop never fetches scalars
    # per step (a host sync per step costs ~34 ms over a tunneled TPU and
    # stalls the dispatch pipeline anywhere).  Metrics accumulate as
    # device scalars and flush as ONE stacked transfer at log/validation
    # boundaries; checkpoint cadence uses the host-side micro counter.
    pending: List = []

    def flush_metrics():
        nonlocal total_correct, total_preds
        if not pending:
            return
        keys = list(pending[0][1].keys())
        mat = np.asarray(jnp.stack(
            [jnp.stack([m[k].astype(jnp.float32) for k in keys])
             for _, m in pending]))
        for (gs, _), row in zip(pending, mat):
            vals = dict(zip(keys, row.tolist()))
            running_loss(vals["loss"])
            TB_LOGGER.global_step = gs
            TB_LOGGER.add_scalar("train/loss", vals["loss"])
            # lr is a pure host function of the step (reference logs
            # train/lr_* too, run_video_retrieval.py:468-482) — no
            # device fetch
            TB_LOGGER.add_scalar("train/lr", train_steps.lr_at(
                cfg, cfg.num_train_steps, gs))
            if "grad_norm" in vals:
                TB_LOGGER.add_scalar("train/grad_norm", vals["grad_norm"])
            if "acc_correct" in vals:
                total_correct += int(vals["acc_correct"])
                total_preds += int(vals["acc_total"])
        pending.clear()

    # per-host rows: the global batch (B x all devices) assigned to
    # hosts from the batch sharding itself (host_batch_positions) —
    # data-axis-aligned hosts get disjoint blocks, hosts straddling a
    # non-data mesh axis collate identical replica rows, and
    # shard_batch assembles the global array from the local shards
    n_hosts = jax.process_count()
    global_batch = cfg.train_batch_size * n_dev
    host_positions = None
    if n_hosts > 1:
        from sasvqa_tpu.parallel.mesh import host_batch_positions
        host_positions = host_batch_positions(mesh, global_batch)
        per_host_batch = len(host_positions)
    else:
        per_host_batch = global_batch
    n_workers = int(cfg.get("n_workers", 0) or 0)
    pool = prefetch = None
    if cfg.num_train_steps > 0:
        # inference-only runs skip the pipeline entirely: the prefetch
        # thread starts staging batches to the device on construction
        if n_workers > 0:
            from sasvqa_tpu.data.pipeline import CollatorPool
            pool = CollatorPool(train_ds, collator, n_workers)
        source = infinite_batches(train_ds, collator, per_host_batch,
                                  host_rng, pool=pool,
                                  host_positions=host_positions,
                                  global_batch=global_batch)
        if use_scan:
            from sasvqa_tpu.data.pipeline import stack_microbatches
            source = stack_microbatches(source, accum)
        # a K-stacked batch is K× the device bytes (msvd_qa_base2's
        # K=128 stack is ~0.9 GB); depth 2 would pin ~3 stacked batches
        # in HBM.  depth 1 still overlaps staging with the (K-micro-
        # long) step — one batch computing, one staging.
        depth = 1 if use_scan and accum >= 16 else 2
        prefetch = DevicePrefetcher(source, mesh=mesh, micro_axis=use_scan,
                                    depth=depth)
    # --profile_steps: device-trace a window of steps after compile.
    # The start is relative to THIS invocation's first step (resumed
    # runs begin at start global_step, not 0)
    prof_n = int(cfg.get("profile_steps", 0) or 0)
    prof_start = global_step + 2
    prof = {"on": False, "stop_at": 0}

    def prof_stop(metrics=None):
        if metrics is not None:
            float(metrics["loss"])   # drain async dispatch first
        jax.profiler.stop_trace()
        prof["on"] = False

    def prof_tick(global_step, metrics):
        if prof_n <= 0:
            return
        if not prof["on"] and global_step == prof_start:
            jax.profiler.start_trace(os.path.join(output_dir, "trace"))
            prof.update(on=True, stop_at=global_step + prof_n)
            LOGGER.info(f"profiling steps [{prof_start}, "
                        f"{prof['stop_at']}) -> {output_dir}/trace")
        elif prof["on"] and global_step >= prof["stop_at"]:
            prof_stop(metrics)

    t_start = time.time()
    # scan path: one loop iteration consumes K stacked micros and is
    # always an accumulation boundary; state.step still counts micros
    micros_per_call = accum if use_scan else 1
    for batch, host_meta in (prefetch if prefetch is not None else ()):
        state, metrics = train_step(state, batch, dropout_key)
        micro += micros_per_call
        if micro % cfg.gradient_accumulation_steps == 0:
            global_step += 1
            pending.append((global_step, metrics))
            boundary = (global_step % log_every == 0
                        or global_step % cfg.valid_steps == 0
                        or global_step >= cfg.num_train_steps
                        or (cfg.debug and global_step >= debug_cap)
                        or preempted["flag"])
            if boundary:
                flush_metrics()
            if global_step % log_every == 0:
                acc = total_correct / (total_preds + 1e-6)
                LOGGER.info(f"step {global_step}/{cfg.num_train_steps} "
                            f"{running_loss} acc {100*acc:.2f} "
                            f"({(time.time()-t_start):.0f}s)")
            prof_tick(global_step, metrics)
            restorer.maybe_save(start_micro + micro, state)
            if global_step % cfg.valid_steps == 0:
                if prof["on"]:
                    # truncate the window rather than pollute the step
                    # trace with a full validation pass + host gathers
                    LOGGER.info("profiling window truncated at a "
                                "validation boundary")
                    prof_stop(metrics)
                total_correct = total_preds = 0
                # the final step skips the in-loop eval: the final_
                # validation right after the loop evaluates the exact
                # same params — running both doubled the exit cost
                # (4 full-split eval passes instead of 2)
                if global_step < cfg.num_train_steps:
                    res_v, _ = run_validation()
                    last_scores = res_v["scores"]
                from sasvqa_tpu.parallel.mesh import fetch_params_for_save
                saver.save(global_step,
                           fetch_params_for_save(state.params, mesh))
                last_saved_step = global_step
            # preemption honored only at accumulation boundaries so a
            # resumed run's micro counter stays aligned with the
            # MultiSteps update cycle
            if preempted["flag"]:
                if prof["on"]:
                    prof_stop()
                prefetch.close()
                if pool is not None:
                    pool.close()
                restorer.force_save(start_micro + micro, state)
                restorer.wait()
                saver.wait()  # an eval snapshot dispatched this same
                # boundary is async — exiting now would discard it
                LOGGER.info("preemption checkpoint saved; exiting")
                return {"val": last_scores, "test": {},
                        "train_loss": running_loss.val,
                        "global_step": global_step, "preempted": True}
        if global_step >= cfg.num_train_steps:
            break
        if cfg.debug and global_step >= debug_cap:
            break

    flush_metrics()
    if prof["on"]:        # loop ended inside the profiling window
        prof_stop()
    if prefetch is not None:
        prefetch.close()  # release staged device batches before final eval
    if pool is not None:
        pool.close()
    # guarantee a final eval snapshot: when num_train_steps never hits a
    # valid_steps boundary the loop saves nothing, leaving --do_inference
    # with no snapshot to restore (the reference has the same hole —
    # it only saves inside its valid-steps block, run_video_qa.py:515-522).
    # micro > 0 = training actually ran THIS invocation: an
    # inference-only run must not re-save its restored params under the
    # resumed global_step (that would mislabel an older snapshot)
    if micro > 0 and global_step > 0 and last_saved_step != global_step:
        from sasvqa_tpu.parallel.mesh import fetch_params_for_save
        saver.save(global_step, fetch_params_for_save(state.params, mesh))
    res_v, res_t = run_validation("final_")
    saver.wait()
    restorer.wait()
    return {"val": res_v["scores"], "test": res_t["scores"],
            "train_loss": running_loss.val, "global_step": global_step}


def main(argv: Optional[List[str]] = None):
    cfg = get_video_qa_args(argv)
    if cfg.do_inference:
        # reference --do_inference is a no-op (run_video_qa.py:536-537);
        # here it runs a standalone validation pass instead.  With zero
        # train steps the loop falls through straight to the final_
        # validation, so no zero_eval (that would evaluate both splits
        # twice per invocation).
        LOGGER.info("inference-only mode")
        cfg.num_train_epochs = 0
        cfg.zero_eval = False
    return start_training(cfg)


if __name__ == "__main__":
    main()
