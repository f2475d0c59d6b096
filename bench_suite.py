"""Benchmark suite: one row per BASELINE.md reference config class.

``bench.py`` keeps the driver's single-JSON-line contract (the flagship
GIT-base 8-frame train step); this suite covers the other reference
training configurations (/root/reference/src/configs/*.json shapes, see
BASELINE.md) and prints one JSON line per row plus an MFU estimate:

    python bench_suite.py            # all rows
    python bench_suite.py git6 mif2  # subset

MFU = XLA-reported FLOPs of the compiled step / step time / v5e bf16
peak (197 TFLOP/s).  FLOPs come from ``compiled.cost_analysis()`` and
include Pallas kernels via their declared CostEstimate (which counts
padded attention blocks), so MFU here is a mildly *optimistic* bound on
useful-FLOP utilization.

Rows (batch/frames mirror the reference configs; text len 32 covers the
question + answer budget used in training):

- git6:     msvd_qa_base   — GIT-base, B=6,  6 stored frames, uniform/1
- git8:     flagship       — GIT-base, B=16, 8 frames (bench.py shape)
- mif2:     msrvtt_qa_base2— GIT-base, B=16, 2 MIF-selected frames
- clip1:    msvd_qa_base3  — CLIP ViT-B/16 classifier, B=8, single frame
- vitl16:   stretch        — GIT + ViT-L/14, B=8, 16 frames, remat
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_TFLOPS = 197.0  # bf16 MXU peak per chip


def _git_model(large=False, remat=False):
    import dataclasses
    from sasvqa_tpu.models.git import GIT_BASE, GITForCausalLM
    cfg = GIT_BASE
    if large:
        from sasvqa_tpu.models.clip import CLIP_VIT_L14
        cfg = dataclasses.replace(GIT_BASE, vision=CLIP_VIT_L14[1])
    return GITForCausalLM(cfg, dtype=jnp.bfloat16, remat=remat)


def _clip_model():
    from sasvqa_tpu.models.clip import CLIP_VIT_B16
    from sasvqa_tpu.models.video_qa import (CLIPVideoQA,
                                            ClassifierHeadConfig)
    tc, vc = CLIP_VIT_B16
    return CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=1000),
                       dtype=jnp.bfloat16)


def _measure(name, model, batch, frames, txt_len, classifier=False,
             img=224, steps=12, moment_dtype="f32"):
    import optax
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1000, size=(batch, txt_len)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(
        rng.normal(size=(batch, frames, img, img, 3)), jnp.float32)
    if classifier:
        labels = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)
    else:
        labels = jnp.where(mask == 1, ids, -100)

    params = jax.jit(model.init)(jax.random.key(0), ids, mask,
                                 pixels[:, :1])
    if moment_dtype == "bf16":
        # --adamw_moment_dtype bf16 equivalent (same b1/b2/eps/wd as the
        # optax.adamw defaults below, moments STORED bf16)
        from sasvqa_tpu.train.steps import _scale_by_adam_lowp
        tx = optax.chain(
            _scale_by_adam_lowp(0.9, 0.999, 1e-8, jnp.bfloat16),
            optax.add_decayed_weights(1e-4),
            optax.scale_by_learning_rate(1e-5))
    else:
        tx = optax.adamw(1e-5)
    opt_state = tx.init(params)

    # batch arrays are jit ARGUMENTS, not closure captures — captured
    # arrays bake into the HLO as constants (see MDFEncoder note in
    # tools/extract_frames.py: that blows remote-compile size limits)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, mask, pixels, labels):
        def loss_fn(p):
            out = model.apply(p, ids, mask, pixels, labels=labels,
                              deterministic=True)
            return out["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    args = (ids, mask, pixels, labels)
    # AOT-compile once and reuse the executable for the timed loop — the
    # jit cache and the lower().compile() cache are separate, so calling
    # step() after this would compile the identical program a second
    # time (minutes per config on the 1-core box)
    compiled = step.lower(params, opt_state, *args).compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        step_flops = float(ca.get("flops", 0.0))
    except Exception:
        step_flops = 0.0
    step = compiled

    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, *args)
        float(loss)  # reliable sync on the tunneled runtime
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, *args)
    float(loss)
    dt = (time.perf_counter() - t0) / steps

    mfu = step_flops / dt / (V5E_PEAK_TFLOPS * 1e12) if step_flops else None
    print(json.dumps({
        "config": name, "batch": batch, "frames": frames,
        "ms_per_step": round(dt * 1000, 1),
        "qa_pairs_per_sec_per_chip": round(batch / dt, 2),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu_vs_197tf": round(mfu, 3) if mfu is not None else None,
    }), flush=True)


def _measure_eval(name="git8_eval", batch=16, frames=8, txt_len=16,
                  max_new=32, steps=8):
    """Generative eval throughput: cached greedy decode, fixed budget of
    ``max_new`` (random weights never emit EOS, so this is the
    worst-case decode length — real answers early-exit the while_loop)."""
    from sasvqa_tpu.models.git import greedy_generate
    model = _git_model()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1000, size=(batch, txt_len)),
                      jnp.int32)
    plen = jnp.full((batch,), txt_len, jnp.int32)
    pixels = jnp.asarray(
        rng.normal(size=(batch, frames, 224, 224, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), ids,
                                 jnp.ones_like(ids), pixels[:, :1])

    @jax.jit
    def step(params, ids, plen, pixels):
        return greedy_generate(model, params, ids, plen, pixels,
                               max_text_len=50, max_new_tokens=max_new)

    for _ in range(2):
        np.asarray(step(params, ids, plen, pixels))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(params, ids, plen, pixels)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "config": name, "batch": batch, "frames": frames,
        "max_new_tokens": max_new,
        "ms_per_batch": round(dt * 1000, 1),
        "qa_pairs_per_sec_per_chip": round(batch / dt, 2),
    }), flush=True)


def _measure_accum(name="git6_accum8", batch=6, frames=6, txt_len=32,
                   k=8, calls=4, family="git"):
    """Gradient-accumulation formulations head-to-head at msvd_base
    shape (reference configs accumulate 8-128 micros,
    configs/msvd_qa_base2.json): ms per MICRO step for (a) scan_accum
    (default: lax.scan over K stacked micros, ONE optimizer update) and
    (b) optax.MultiSteps (full inner update every micro, K-1 of K
    discarded).  Both run the real train/steps builders.

    family="classifier" runs the CLIP head instead (msvd_qa_base3
    accumulates 4 micros of B=8; the r4 clip1 profile showed its plain
    step is ~40% AdamW moment traffic, so ONE update per 4 micros is a
    class win — bench row clip1a)."""
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.train import steps as train_steps

    model = _git_model() if family == "git" else _clip_model()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1000, size=(batch, txt_len)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(
        rng.normal(size=(batch, frames, 224, 224, 3)), jnp.float32)
    if family == "git":
        labels = jnp.where(mask == 1, ids, -100)
    else:
        labels = jnp.asarray(rng.integers(0, 1000, size=(batch,)),
                             jnp.int32)
    key = jax.random.key(1)

    def mk_state(scan):
        cfg = ConfigDict(optim="adamw", learning_rate=1e-5,
                         decay="constant", weight_decay=0.01, grad_norm=2.0,
                         num_train_epochs=1,
                         gradient_accumulation_steps=k, scan_accum=scan,
                         betas=[0.9, 0.98])
        params = jax.jit(model.init)(jax.random.key(0), ids, mask,
                                     pixels[:, :1])
        return train_steps.create_train_state(model, params, cfg,
                                              total_steps=1000)

    # (a) scan accumulation: one call = K micros
    state = mk_state(scan=1)
    step = train_steps.make_scan_train_step(k, family)
    sbatch = {"text_input_ids": jnp.stack([ids] * k),
              "text_attention_mask": jnp.stack([mask] * k),
              "visual_inputs": jnp.stack([pixels] * k),
              "labels": jnp.stack([labels] * k)}
    state, m = step(state, sbatch, key)
    float(m["loss"])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(calls):
        state, m = step(state, sbatch, key)
    float(m["loss"])
    dt_scan = (time.perf_counter() - t0) / (calls * k)

    # (b) MultiSteps: one call = one micro
    state = mk_state(scan=0)
    step = (train_steps.make_git_train_step() if family == "git"
            else train_steps.make_classifier_train_step())
    batch_d = {"text_input_ids": ids, "text_attention_mask": mask,
               "visual_inputs": pixels, "labels": labels}
    state, m = step(state, batch_d, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(calls * k):
        state, m = step(state, batch_d, key)
    float(m["loss"])
    dt_ms = (time.perf_counter() - t0) / (calls * k)

    print(json.dumps({
        "config": name, "batch": batch, "frames": frames, "k_micro": k,
        "ms_per_micro_scan": round(dt_scan * 1000, 1),
        "ms_per_micro_multisteps": round(dt_ms * 1000, 1),
        "scan_speedup": round(dt_ms / dt_scan, 3),
    }), flush=True)


def _measure_scorer(name="mif_score_stageB", k=32, max_length=64,
                    steps=20):
    """Offline stage-B part 2 (gen_inds): BERT-base scorer over one
    question's K (question, caption) pairs per call — questions/sec/chip
    (reference scores pair-by-...-batch via HF on GPU,
    gen_sample.py:80-89)."""
    import jax
    from sasvqa_tpu.models.bert import (BERTConfig,
                                        BERTForSequenceClassification)
    model = BERTForSequenceClassification(BERTConfig(vocab_size=30522))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30000, size=(k, max_length)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    types = jnp.asarray(
        (np.arange(max_length)[None, :] >= 10).astype(np.int32)
        * np.ones((k, 1), np.int32))
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, types)
    fn = jax.jit(lambda p, i, m, t: model.apply(p, i, m, t))
    np.asarray(fn(params, ids, mask, types))  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(params, ids, mask, types)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "config": name, "pairs_per_question": k, "max_length": max_length,
        "ms_per_question": round(dt * 1000, 2),
        "questions_per_sec_per_chip": round(1 / dt, 1),
    }), flush=True)


def _measure_mdf(name="mdf_stageA", n_frames=256, k=16, w=8, steps=6):
    """Offline stage-A device throughput: frozen ViT encode of every
    decoded frame + on-device banded MDF selection (frames/sec/chip).

    Frames are device-resident (the real tool's decode thread overlaps
    H2D with compute; over the bench tunnel a per-call 154 MB transfer
    would swamp the measurement)."""
    from sasvqa_tpu.tools.extract_frames import MDFEncoder, bucket_for
    enc = MDFEncoder(k=k, window=w)
    rng = np.random.default_rng(0)
    bucket = bucket_for(n_frames)
    frames = jnp.asarray(rng.normal(
        size=(bucket, 224, 224, 3)).astype(np.float32))
    fn = enc._fn_for(bucket, w)
    np.asarray(fn(enc._params, frames, n_frames)[0])  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        inds, _ = fn(enc._params, frames, n_frames)
    np.asarray(inds)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "config": name, "frames_per_video": n_frames, "K": k,
        "ms_per_video": round(dt * 1000, 1),
        "frames_per_sec_per_chip": round(n_frames / dt, 1),
    }), flush=True)


def _measure_host(name="host_margin", n_batches=40):
    """Host-side input margin per config class (VERDICT r3 #8): serial
    collation rate (synthetic in-memory groups through the REAL
    collators, bf16 pixel staging) vs the measured single-chip device
    demand (BASELINE.md table).  margin < ~1.5 on a pod host means the
    input pipeline needs CollatorPool workers (or more cores) to keep
    that config's chips fed.

    Synthetic caveats: groups are in-memory (no h5 read — add disk IO on
    real stores) and text uses the WordPiece test vocab (CLIP's BPE is
    slightly costlier on long questions).  Both are small next to the
    frame gather/stack/cast that dominates collation.
    """
    from sasvqa_tpu.data.dataset import ClassifierCollator, GITCollator
    from sasvqa_tpu.data.tokenization import make_test_wordpiece

    tok = make_test_wordpiece(["what", "is", "the", "person", "doing",
                               "in", "this", "video", "clip", "answer"])
    rng = np.random.default_rng(0)

    def mk_items(b, k_stored, with_inds=False):
        items = []
        for i in range(b):
            ex = {"q_str": "what is the person doing in this video",
                  "question_id": i, "label": 3, "str_label": "answer"}
            if with_inds:
                ex["sampled_inds"] = list(range(k_stored))
            items.append({
                "vid": rng.normal(size=(k_stored, 224, 224, 3))
                          .astype(np.float32),
                "examples": [ex], "n_examples": 1,
                "sampled_inds": ex.get("sampled_inds")})
        return items

    # (collator, B, K stored, needs_inds, measured device qa/s) per
    # BASELINE.md row.  K/policy chosen so the collated frame count
    # equals the device row's T (uniform strides by nframe — nframe=1
    # keeps all K stored frames, the reference img_len semantics).
    rows = [
        ("git6", GITCollator(tok, max_seq_len=32, nframe=1,
                             samp_policy="uniform", pixel_dtype="bf16"),
         6, 6, False, 94.9),
        ("git8", GITCollator(tok, max_seq_len=32, nframe=1,
                             samp_policy="uniform", pixel_dtype="bf16"),
         16, 8, False, 61.9),
        ("mif2", GITCollator(tok, max_seq_len=32, nframe=2,
                             samp_policy="question-caption",
                             pixel_dtype="bf16"), 16, 16, True, 282.9),
        ("clip1", ClassifierCollator(tok, max_txt_len=32, nframe=4,
                                     samp_policy="single",
                                     pixel_dtype="bf16"), 8, 32, False,
         539.5),
        ("vitl16", GITCollator(tok, max_seq_len=32, nframe=1,
                               samp_policy="uniform", pixel_dtype="bf16"),
         8, 16, False, 6.76),
    ]
    crng = np.random.default_rng(1)
    for cfg_name, collator, b, k_stored, with_inds, device_qa in rows:
        items = mk_items(b, k_stored, with_inds)
        collator(items, rng=crng)  # warm (lru caches, allocator)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            batch = collator(items, rng=crng)
        dt = (time.perf_counter() - t0) / n_batches
        host_qa = b / dt
        print(json.dumps({
            "config": f"{name}_{cfg_name}", "batch": b,
            "ms_per_collate": round(dt * 1000, 1),
            "host_qa_pairs_per_sec_serial": round(host_qa, 1),
            "device_demand_qa_pairs_per_sec": device_qa,
            "host_margin_x": round(host_qa / device_qa, 2),
        }), flush=True)
        del batch


def _measure_hostdisk(name="hostdisk_margin", n_batches=30,
                      scale_root=None):
    """On-disk host-pipeline margins (VERDICT r4 #2): the same per-row
    collate demand as ``host``, but through the REAL path — grouped
    annotations -> VideoQADataset.get_group -> FrameStoreReader h5 row
    reads -> collator — against full-shape 224² float32 stores on disk
    (built once under ``scale_root``; the k=16 rows read the MSVD-scale
    1970-video store, other stored-K rows read 400-video side stores of
    identical row geometry).  Questions tokenize through a 30k-entry
    WordPiece vocab (BERT scale).  Reads are page-cache warm after the
    warmup pass — the steady-state regime of epoch training on a pod
    host (stores ≪ host RAM).  h5_read_ms isolates the warm h5 cost of
    the collate's OWN access pattern: the timed loop's partial-frame
    reads are recorded and replayed alone (first-epoch cold reads are
    additionally disk-bandwidth-bound and not modeled here).
    """
    import os
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.dataset import (ClassifierCollator, GITCollator,
                                         VideoQADataset)
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.data.pipeline import collate_indices
    from sasvqa_tpu.data.tokenization import make_test_wordpiece
    from sasvqa_tpu.tools.make_scale_store import make_scale_store

    scale_root = scale_root or os.environ.get("SASVQA_SCALE_DIR",
                                              "/root/scale_store")
    # BERT-scale vocab: the question words plus 30k filler entries so
    # the WordPiece trie runs at its real fan-out
    extra = ([w for w in ("what", "is", "the", "person", "man", "woman",
                          "dog", "cat", "group", "child", "player",
                          "car", "animal", "doing", "holding", "playing",
                          "riding", "cooking", "singing", "throwing",
                          "cutting", "driving", "watching", "who", "how",
                          "where", "when")]
             + [f"ans{i:04d}" for i in range(1800)]
             + [f"tok{i:05d}" for i in range(28000)])
    tok = make_test_wordpiece(extra)

    def store_for(k):
        if k == 16:
            return make_scale_store(os.path.join(scale_root, "main"))
        return make_scale_store(
            os.path.join(scale_root, f"side_k{k}"), num_videos=400,
            k=k, n_questions={"train": 2000, "val": 400, "test": 400})

    rows = [
        ("git6", lambda: GITCollator(tok, max_seq_len=32, nframe=1,
                                     samp_policy="uniform",
                                     pixel_dtype="bf16"), 6, 6, 94.9),
        ("git8", lambda: GITCollator(tok, max_seq_len=32, nframe=1,
                                     samp_policy="uniform",
                                     pixel_dtype="bf16"), 16, 8, 61.9),
        ("mif2", lambda: GITCollator(tok, max_seq_len=32, nframe=2,
                                     samp_policy="question-caption",
                                     pixel_dtype="bf16"), 16, 16, 282.9),
        ("clip1", lambda: ClassifierCollator(tok, max_txt_len=32,
                                             nframe=4,
                                             samp_policy="single",
                                             pixel_dtype="bf16"), 8, 32,
         539.5),
        ("vitl16", lambda: GITCollator(tok, max_seq_len=32, nframe=1,
                                       samp_policy="uniform",
                                       pixel_dtype="bf16"), 8, 16, 6.76),
    ]
    for cfg_name, mk_collator, b, k_stored, device_qa in rows:
        paths = store_for(k_stored)
        datalist = load_datalist("msvd_qa", paths["train"])
        grouped = group_datalist(datalist, 1, is_train=True)
        ans2label = build_common_answer_dict((paths["train"],), 1000)
        ds = VideoQADataset("msvd_qa", grouped,
                            FrameStoreReader(paths["h5"]),
                            load_vidmapping(paths["vidmapping"]),
                            ans2label, return_label=True, is_train=True)
        collator = mk_collator()
        rng = np.random.default_rng(0)
        idxs = [rng.integers(0, len(grouped), size=b)
                for _ in range(n_batches + 1)]
        collate_indices(ds, collator, idxs[0],
                        np.random.default_rng(1))  # warm cache + trie
        # record the EXACT partial-frame reads the collate loop issues
        # so the isolated h5 cost below replays the same access pattern
        # (same rows, same selected frames) — a full-row sweep would
        # overstate the h5 share by up to k_stored/k_used
        reads = []
        orig_read = ds.store.read_frames_nhwc

        def _recording_read(row, inds):
            reads.append((row, np.asarray(inds).copy()))
            return orig_read(row, inds)

        ds.store.read_frames_nhwc = _recording_read
        t0 = time.perf_counter()
        for i in range(1, n_batches + 1):
            batch = collate_indices(ds, collator, idxs[i],
                                    np.random.default_rng(i))
        dt = (time.perf_counter() - t0) / n_batches
        del ds.store.read_frames_nhwc          # un-shadow the method
        # isolated warm h5-read cost, replaying the recorded pattern
        t0 = time.perf_counter()
        for row, inds in reads:
            ds.store.read_frames_nhwc(row, inds)
        h5_dt = (time.perf_counter() - t0) / n_batches
        host_qa = b / dt
        print(json.dumps({
            "config": f"{name}_{cfg_name}", "batch": b,
            "k_stored": k_stored,
            "ms_per_collate_disk": round(dt * 1000, 1),
            "h5_read_ms": round(h5_dt * 1000, 1),
            "host_qa_pairs_per_sec_serial": round(host_qa, 1),
            "device_demand_qa_pairs_per_sec": device_qa,
            "host_margin_x": round(host_qa / device_qa, 2),
        }), flush=True)
        del batch
        ds.store.close()


def _measure_serve(name="serve_engine", batch_size=8, loads=(1, 8, 32),
                   n_requests=64, nframe=6, k_stored=16,
                   max_new_tokens=8, pixel_dtype="f32"):
    """QAEngine latency/throughput on the real chip (VERDICT r4 #7/#8):
    closed-loop offered loads — N client threads, each submitting its
    next request as the previous resolves, so N requests stay in
    flight.  Reports p50/p99 end-to-end latency and sustained qa/s per
    load, for GIT-base at serving defaults (6 frames re-sampled from a
    16-frame store row, 224², greedy decode).  Engine batching rides
    linger_ms=5: at load 1 every batch is a padded single (latency
    floor); at loads >= batch_size batches fill and amortize."""
    import threading
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer
    from sasvqa_tpu.tasks.serve import QAEngine

    cfg = ConfigDict({"model": {"pretrained_model":
                                "microsoft/git-base-msrvtt-qa",
                                "vocab_size": None},
                      "img_size": 224, "num_labels": 1000,
                      "tokenizer_dir": None, "classifier": "mlp"})
    family, model = build_model(cfg, dtype=jnp.bfloat16)
    tok = build_tokenizer(cfg, family)
    ids = jnp.ones((1, 8), jnp.int32)
    px = jnp.zeros((1, 1, 224, 224, 3))
    params = jax.jit(model.init)(jax.random.key(0), ids,
                                 jnp.ones_like(ids), px)
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(k_stored, 224, 224, 3)).astype(np.float32)
    questions = [f"what is the person doing in clip {i}"
                 for i in range(n_requests)]

    eng = QAEngine(model, params, family, tok, ans2label={"yes": 0},
                   nframe=nframe, samp_policy="uniform",
                   batch_size=batch_size, linger_ms=5.0,
                   max_txt_len=20, max_text_len=16 + max_new_tokens,
                   pixel_dtype=pixel_dtype)
    try:
        eng.answer(frames, "warmup question", timeout=600)  # compile
        eng.stats.update(requests=0, batches=0, batch_rows=0)
        for load in loads:
            lat = []
            lock = threading.Lock()
            cursor = {"i": 0}

            def client():
                while True:
                    with lock:
                        i = cursor["i"]
                        if i >= n_requests:
                            return
                        cursor["i"] = i + 1
                    t0 = time.perf_counter()
                    eng.answer(frames, questions[i], timeout=600)
                    with lock:
                        lat.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            threads = [threading.Thread(target=client)
                       for _ in range(load)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            lat_ms = np.sort(np.asarray(lat)) * 1000
            print(json.dumps({
                "config": f"{name}_load{load}", "batch_size": batch_size,
                "concurrent": load, "requests": n_requests,
                "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
                "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
                "qa_per_s": round(n_requests / wall, 2),
                "batches": eng.stats["batches"],
                "fill": round(eng.stats["requests"]
                              / max(eng.stats["batch_rows"], 1), 2),
            }), flush=True)
            eng.stats.update(requests=0, batches=0, batch_rows=0)
    finally:
        eng.close()


ROWS = {
    "git6": lambda: _measure("git6_msvd_base", _git_model(), 6, 6, 32),
    "git8": lambda: _measure("git8_flagship", _git_model(), 16, 8, 32),
    "mif2": lambda: _measure("mif2_msrvtt_base2", _git_model(), 16, 2, 32),
    "clip1": lambda: _measure("clip1_msvd_base3", _clip_model(), 8, 1, 32,
                              classifier=True),
    "vitl16": lambda: _measure("vitl16_stretch",
                               _git_model(large=True, remat=True), 8, 16,
                               32, steps=6),
    # --adamw_moment_dtype bf16 A/B rows (PARITY.md #15): the optimizer
    # update is HBM-bound; bf16 moments cut its traffic ~29%
    "git8m": lambda: _measure("git8_bf16_moments", _git_model(), 16, 8,
                              32, moment_dtype="bf16"),
    "clip1m": lambda: _measure("clip1_bf16_moments", _clip_model(), 8, 1,
                               32, classifier=True, moment_dtype="bf16"),
    "host": _measure_host,
    "hostdisk": _measure_hostdisk,
    "serve": _measure_serve,
    # u8 pixel wire format (core/pixels.py): quarters the per-request
    # H2D bytes — serving is ~85% pixel staging on H2D-bound hosts
    "serveu8": lambda: _measure_serve(name="serve_engine_u8",
                                      pixel_dtype="u8"),
    "accum": _measure_accum,
    "clip1a": lambda: _measure_accum("clip1_accum4", batch=8, frames=1,
                                     k=4, calls=8, family="classifier"),
    "eval": _measure_eval,
    "mdf": _measure_mdf,
    "score": _measure_scorer,
    # MIF stage B part 1 (gen_sample gen_cap): [CLS]-prompted 30-token
    # frame captions, batched over frames (reference generate
    # max_length=30, preprocessing/gen_sample.py:20-25)
    "cap": lambda: _measure_eval(name="mif_gen_cap_stageB", batch=32,
                                 frames=1, txt_len=1, max_new=29),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(ROWS)
    for n in names:
        ROWS[n]()
