"""Batched online inference (serving) for trained SAS-VQA models.

The reference has NO serving surface: its only inference is the
validation loop inside training (run_video_qa.py:283-387) and
``--do_inference`` is a no-op (:536-537).  This module is the
deployment path the reference never built — a micro-batching engine
that turns concurrent single (video, question) requests into the
fixed-shape batches the TPU wants:

- requests enqueue from any thread via :meth:`QAEngine.submit`, which
  returns a ``concurrent.futures.Future``;
- one dispatcher thread drains up to ``batch_size`` requests (after the
  first arrives it lingers ``linger_ms`` for more — latency bounded,
  batches as full as the offered load allows);
- the batch goes through the SAME collators training/eval use
  (``GITCollator(add_ans=False)`` / ``ClassifierCollator``), short rows
  padded by repeating the last request, so every call has one static
  shape -> exactly one XLA compile per engine (TPU jit caches on
  shapes; a shape-per-batch-size serving loop would recompile under
  load);
- answers come back through the eval-loop semantics: generative GIT
  decodes greedily and answers with the generated text (label = last
  word via ans2label, run_video_qa.py:325-326); classifiers argmax into
  the answer vocabulary.

The CLI front reads JSONL requests ``{"video": path, "question": str}``
and writes ``{"question", "answer", "label"}`` lines — decode and
preprocessing ride the stage-A pipeline (native shim, HF-processor
geometry), weights load exactly like ``tasks/predict``.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional

import numpy as np

from sasvqa_tpu.core.logging import LOGGER


class QAEngine:
    """Micro-batching video-QA inference engine.

    model/params: a built model (presets.build_model) with loaded
    weights.  family: 'git' | 'clip' | 'blip'.  ans2label: answer
    vocabulary (required for classifiers; optional for GIT, where it
    adds the reference's last-word label mapping on top of the raw
    answer string).  nframe/samp_policy: the collator's frame
    re-sampling, same knobs as training.
    """

    def __init__(self, model, params, family: str, tokenizer,
                 ans2label: Optional[Dict[str, int]] = None,
                 nframe: int = 4, samp_policy: str = "uniform",
                 batch_size: int = 8, linger_ms: float = 5.0,
                 max_txt_len: int = 20, max_text_len: int = 50,
                 mesh=None, pixel_dtype: str = "f32"):
        import jax.numpy as jnp
        from sasvqa_tpu.data.dataset import ClassifierCollator, GITCollator
        from sasvqa_tpu.train import steps as train_steps

        if family not in ("git", "clip", "blip"):
            raise ValueError(f"unknown model family {family!r}")
        if family != "git" and not ans2label:
            raise ValueError("classifier serving needs an ans2label "
                             "answer vocabulary")
        self.family = family
        self.tokenizer = tokenizer
        self.ans2label = ans2label or {}
        self.label2ans = {v: k for k, v in self.ans2label.items()}
        self.batch_size = int(batch_size)
        self.linger_s = float(linger_ms) / 1e3

        # pixel_dtype: the request->device wire format.  "u8" quarters
        # the dominant transfer (core/pixels.py; lossless when requests
        # come from preprocess_frames, e.g. the CLI decode path) — on
        # H2D-bound hosts serving is ~85% pixel staging (BASELINE.md).
        # The f32 default keeps the engine's numerics byte-identical to
        # direct eval for arbitrary float inputs.
        if family == "git":
            self._collator = GITCollator(
                tokenizer, max_txt_len=max_txt_len, task_type="msvd_qa",
                nframe=nframe, samp_policy=samp_policy, add_ans=False,
                pixel_dtype=pixel_dtype)
            self._eval_step = train_steps.make_git_eval_step(
                model, max_text_len=max_text_len, mesh=mesh)
        else:
            self._collator = ClassifierCollator(
                tokenizer, max_txt_len=max_txt_len, task_type="msvd_qa",
                nframe=nframe, samp_policy=samp_policy,
                pixel_dtype=pixel_dtype)
            self._eval_step = train_steps.make_classifier_eval_step(
                mesh=mesh)
        self._state = train_steps.TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=None,
            tx=None, apply_fn=model.apply)

        self.stats = {"requests": 0, "batches": 0, "batch_rows": 0}
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # submit()/close() handshake: without this lock a request that
        # passes the _closed check while close() runs would be enqueued
        # BEHIND the shutdown sentinel and its future would never
        # resolve (advisor r4).  The dispatcher additionally drains any
        # stragglers after the sentinel and fails their futures loudly.
        self._lock = threading.Lock()
        # All co-batched requests share ONE collator pass whose frame
        # re-sampling indices and output H/W come from the batch's
        # FIRST item (dataset.py _resample_frames) — a mixed-shape
        # batch is silently wrong (more stored frames: sampled only
        # from the first K0) or throws (fewer / different H/W), so the
        # engine pins (K, H, W, 3) to the first submitted shape and
        # rejects mismatches at submit() time, before they can poison a
        # shared batch (advisor r4, medium).
        self._frame_shape: Optional[tuple] = None
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        daemon=True, name="qa-engine")
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, frames: np.ndarray, question: str) -> Future:
        """frames: (K, H, W, 3) float normalized (frame-store layout);
        the collator re-samples ``nframe`` of them by ``samp_policy``.
        All requests to one engine must share a single (K, H, W, 3)
        shape — the first submit pins it.  Returns a Future resolving
        to {"answer": str, "label": int}."""
        frames = np.asarray(frames)
        if frames.ndim != 4 or frames.shape[-1] != 3:
            raise ValueError(f"frames must be (K, H, W, 3), "
                             f"got {frames.shape}")
        with self._lock:
            if self._closed:
                raise RuntimeError("engine is closed")
            if self._frame_shape is None:
                self._frame_shape = frames.shape
            elif frames.shape != self._frame_shape:
                raise ValueError(
                    f"frames shape {frames.shape} does not match this "
                    f"engine's pinned shape {self._frame_shape}; requests "
                    "in one engine must share (stored K, H, W, 3)")
            fut: Future = Future()
            self._queue.put((frames, str(question), fut))
        return fut

    def answer(self, frames: np.ndarray, question: str,
               timeout: Optional[float] = None) -> Dict[str, Any]:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(frames, question).result(timeout=timeout)

    def close(self):
        """Drain outstanding requests, then stop the dispatcher."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def _drain_batch(self) -> Optional[List[tuple]]:
        """Block for one request, then linger for more (up to
        batch_size).  None = shutdown sentinel seen."""
        first = self._queue.get()
        if first is None:
            return None
        reqs = [first]
        deadline = time.monotonic() + self.linger_s
        while len(reqs) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                # keep shutting down AFTER this batch completes
                self._queue.put(None)
                break
            reqs.append(nxt)
        return reqs

    def _dispatch_loop(self):
        while True:
            reqs = self._drain_batch()
            if reqs is None:
                # Shutdown: anything still queued (racing submits that
                # lost to close()) can never run — fail those futures
                # instead of leaving their callers blocked forever.
                while True:
                    try:
                        leftover = self._queue.get_nowait()
                    except queue.Empty:
                        return
                    if leftover is not None:
                        leftover[2].set_exception(
                            RuntimeError("engine closed before this "
                                         "request was dispatched"))
            try:
                results = self._run_batch(reqs)
                for (_, _, fut), res in zip(reqs, results):
                    fut.set_result(res)
            except Exception as e:  # resolve futures, keep serving
                LOGGER.exception("serving batch failed")
                for _, _, fut in reqs:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, reqs: List[tuple]) -> List[Dict[str, Any]]:
        n_real = len(reqs)
        items = [{"vid": frames,
                  "examples": [{"q_str": question, "label": None,
                                "str_label": None, "question_id": i}],
                  "n_examples": 1}
                 for i, (frames, question, _) in enumerate(reqs)]
        # fixed batch shape: repeat the last request into the tail so
        # the jitted step sees ONE shape regardless of offered load
        items += [items[-1]] * (self.batch_size - n_real)
        batch = self._collator(items, rng=np.random.default_rng(0))
        batch.pop("question_ids", None)
        batch.pop("n_examples_list", None)
        if batch.get("labels") is None:
            batch.pop("labels", None)

        if self.family == "git":
            generated = np.asarray(self._eval_step(self._state, batch))
            from sasvqa_tpu.tasks.run_video_qa import decode_answers
            preds, strs = decode_answers(self.tokenizer,
                                         generated[:n_real],
                                         self.ans2label)
            out = [{"answer": s, "label": p}
                   for s, p in zip(strs, preds)]
        else:
            preds, _ = self._eval_step(self._state, batch)
            preds = np.asarray(preds)[:n_real]
            out = [{"answer": self.label2ans.get(int(p), ""),
                    "label": int(p)} for p in preds]

        self.stats["requests"] += n_real
        self.stats["batches"] += 1
        self.stats["batch_rows"] += self.batch_size
        return out


# ---------------------------------------------------------------------------
# CLI: JSONL in -> JSONL out over a trained checkpoint


def serve_requests(engine, requests, decode, out, *, batch_size: int,
                   decode_workers: int = 4) -> None:
    """Bounded decode-ahead request loop (advisor r4 + r5 review).

    A decode thread pool keeps submission bursty enough to fill engine
    batches (serial decode + the 5 ms linger would dispatch every
    request as a padded single — up to batch_size× wasted TPU compute),
    while a sliding in-flight window caps memory at O(window) decoded
    clips — decoding everything up front would hold ~9.6 MB ×
    len(requests) (96 GB for a 10k-request JSONL).  Answers are written
    to ``out`` in request order.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    window = max(4 * batch_size, 2 * decode_workers)
    with ThreadPoolExecutor(decode_workers) as pool:
        def decode_and_submit(req):
            return engine.submit(decode(req), req["question"])

        pending: deque = deque()

        def drain_one():
            req, dfut = pending.popleft()
            res = dfut.result().result()   # decode future -> answer
            out.write(json.dumps({"question": req["question"],
                                  **res}) + "\n")

        for req in requests:
            pending.append((req, pool.submit(decode_and_submit, req)))
            if len(pending) >= window:
                drain_one()
        while pending:
            drain_one()


def build_argparser():
    p = argparse.ArgumentParser(
        description="batched video-QA serving over JSONL requests")
    p.add_argument("--requests", required=True,
                   help="JSONL file of {'video': path, 'question': str}")
    p.add_argument("--out", required=True, help="JSONL output path")
    p.add_argument("--model", default="microsoft/git-base-msrvtt-qa")
    p.add_argument("--weights", default=None,
                   help="local HF checkpoint dir")
    p.add_argument("--orbax_ckpt", default=None,
                   help="trained ModelSaver snapshot dir")
    p.add_argument("--orbax_step", type=int, default=-1,
                   help="snapshot step to serve; -1 = latest (0 is a "
                        "valid explicit step)")
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--ans2label_path", default=None,
                   help="answer vocab JSON (required for classifiers)")
    p.add_argument("--classifier", default="mlp")
    p.add_argument("--num_labels", type=int, default=1000)
    p.add_argument("--nframe", type=int, default=6)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--stored_frames", type=int, default=16,
                   help="frames decoded per video before the collator's "
                        "nframe re-sampling (the stage-A K)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--decode_workers", type=int, default=4,
                   help="CLI decode-ahead threads: enough decode "
                        "throughput to fill engine batches without "
                        "holding every clip in memory at once")
    p.add_argument("--linger_ms", type=float, default=5.0)
    p.add_argument("--pixel_dtype", default="u8",
                   choices=["f32", "bf16", "u8"],
                   help="request->device pixel wire format.  The CLI "
                        "default is u8: its frames come from "
                        "preprocess_frames (on the uint8 grid), where "
                        "u8 staging is LOSSLESS at a quarter of f32's "
                        "bytes (core/pixels.py)")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    import jax.numpy as jnp
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model, load_pretrained_params
    from sasvqa_tpu.tasks.predict import load_frames
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer

    args = build_argparser().parse_args(argv)
    cfg = ConfigDict({
        "model": {"pretrained_model": args.model, "vocab_size": None},
        "img_size": args.img_size, "num_labels": args.num_labels,
        "tokenizer_dir": args.tokenizer_dir,
        "classifier": args.classifier,
    })
    family, model = build_model(cfg, dtype=jnp.bfloat16)
    tokenizer = build_tokenizer(cfg, family)

    import jax
    rng = jax.random.key(0)
    probe_txt = np.zeros((1, 8), np.int32)
    probe_pix = np.zeros((1, 1, args.img_size, args.img_size, 3),
                         np.float32)
    params = jax.jit(model.init)(rng, probe_txt, np.ones_like(probe_txt),
                                 probe_pix)
    if args.weights:
        params = load_pretrained_params(family, model, params,
                                        args.weights)
    if args.orbax_ckpt:
        from sasvqa_tpu.core.checkpoint import ModelSaver
        saver = ModelSaver(args.orbax_ckpt)
        step = args.orbax_step if args.orbax_step >= 0 \
            else saver.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no eval snapshots under {args.orbax_ckpt}")
        params = saver.restore(step, params)

    ans2label = None
    if args.ans2label_path:
        with open(args.ans2label_path) as f:
            ans2label = json.load(f)

    with open(args.requests) as f:
        requests = [json.loads(line) for line in f if line.strip()]
    LOGGER.info(f"serving {len(requests)} requests "
                f"(batch_size={args.batch_size})")

    with QAEngine(model, params, family, tokenizer, ans2label=ans2label,
                  nframe=args.nframe, batch_size=args.batch_size,
                  linger_ms=args.linger_ms,
                  pixel_dtype=args.pixel_dtype) as engine, \
            open(args.out, "w") as out:
        def decode(req):
            return load_frames(req["video"], args.stored_frames,
                               args.img_size)[0]
        serve_requests(engine, requests, decode, out,
                       batch_size=args.batch_size,
                       decode_workers=args.decode_workers)
    LOGGER.info(f"done: {engine.stats}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
