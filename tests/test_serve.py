"""tasks/serve.py — micro-batching inference engine: batch assembly,
fixed-shape padding, answer semantics for both families, concurrency,
error isolation, shutdown."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp


K_STORED = 6
IMG = 32
NFRAME = 2


def _frames(seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(K_STORED, IMG, IMG, 3)).astype(np.float32)


def _build(family_name, num_labels=0):
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model
    from sasvqa_tpu.tasks.run_video_qa import build_tokenizer

    cfg = ConfigDict({"model": {"pretrained_model": family_name,
                                "vocab_size": None},
                      "img_size": IMG, "num_labels": max(num_labels, 1),
                      "tokenizer_dir": None, "classifier": "mlp"})
    family, model = build_model(cfg, dtype=jnp.bfloat16)
    tokenizer = build_tokenizer(cfg, family)
    ids = jnp.ones((1, 4), jnp.int32)
    px = jnp.zeros((1, 1, IMG, IMG, 3))
    params = jax.jit(model.init)(jax.random.key(0), ids,
                                 jnp.ones_like(ids), px)
    return family, model, params, tokenizer


@pytest.fixture(scope="module")
def git_engine():
    from sasvqa_tpu.tasks.serve import QAEngine
    family, model, params, tok = _build("tiny-git")
    eng = QAEngine(model, params, family, tok,
                   ans2label={"yes": 0, "no": 1}, nframe=NFRAME,
                   samp_policy="uniform", batch_size=4, linger_ms=30.0,
                   max_txt_len=8, max_text_len=12)
    yield eng
    eng.close()


def test_git_engine_matches_direct_batch(git_engine):
    """Concurrent submits give exactly the answers a direct full-batch
    run of the same requests produces (same collator, same step)."""
    reqs = [(_frames(i), f"question number {i}") for i in range(4)]
    expected = git_engine._run_batch([(f, q, None) for f, q in reqs])

    futs = [git_engine.submit(f, q) for f, q in reqs]
    got = [f.result(timeout=300) for f in futs]
    # the engine may split these across batches depending on timing;
    # answers must be identical either way (uniform policy, fixed rng)
    for g, e in zip(got, expected):
        assert g == e
    assert all(isinstance(g["answer"], str) for g in got)


def test_partial_batch_equals_full_batch(git_engine):
    """A lone request (tail padded with repeats) answers identically to
    the same request inside a full batch — padding rows can't leak."""
    frames, q = _frames(7), "what is shown"
    solo = git_engine.submit(frames, q).result(timeout=300)
    full = git_engine._run_batch([(frames, q, None)] * 4)
    assert solo == full[0]


def test_submit_from_threads(git_engine):
    results = {}

    def worker(i):
        results[i] = git_engine.answer(_frames(i), f"thread q {i}",
                                       timeout=300)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert set(results) == set(range(6))
    assert all("answer" in r and "label" in r for r in results.values())


def test_bad_frames_rejected_immediately(git_engine):
    with pytest.raises(ValueError):
        git_engine.submit(np.zeros((IMG, IMG, 3), np.float32), "q")


def test_mismatched_shape_rejected_at_submit(git_engine):
    """The engine pins (K, H, W, 3) to the first submitted shape; a
    request with a different stored-K or H/W would be silently
    mis-sampled (or crash) inside a shared collator batch, so it must
    be rejected in submit() before entering the queue."""
    git_engine.answer(_frames(0), "pin the shape", timeout=300)
    with pytest.raises(ValueError, match="pinned shape"):
        git_engine.submit(
            np.zeros((K_STORED + 2, IMG, IMG, 3), np.float32), "q")
    with pytest.raises(ValueError, match="pinned shape"):
        git_engine.submit(
            np.zeros((K_STORED, IMG * 2, IMG * 2, 3), np.float32), "q")
    # matching shape still accepted after the rejections
    ok = git_engine.answer(_frames(1), "still serving", timeout=300)
    assert "answer" in ok


def test_close_fails_queued_stragglers_instead_of_hanging():
    """A request enqueued behind the shutdown sentinel must get an
    exception on its future, not block .result() forever.  The submit/
    close lock makes this unreachable through the public API; this
    drives the dispatcher's defense-in-depth drain directly by holding
    it inside a batch while the sentinel and a straggler are queued."""
    from concurrent.futures import Future
    from sasvqa_tpu.tasks.serve import QAEngine
    family, model, params, tok = _build("tiny-clip", num_labels=2)
    eng = QAEngine(model, params, family, tok,
                   ans2label={"yes": 0, "no": 1}, nframe=NFRAME,
                   batch_size=1, linger_ms=1.0, max_txt_len=8)
    gate = threading.Event()
    entered = threading.Event()
    real_run = eng._run_batch

    def slow_run(reqs):
        entered.set()
        assert gate.wait(timeout=300)
        return real_run(reqs)

    eng._run_batch = slow_run
    blocker = eng.submit(_frames(0), "hold the dispatcher")
    assert entered.wait(timeout=300)
    # dispatcher is now inside slow_run; enqueue sentinel THEN a
    # straggler, exactly the old unlocked check-then-put interleaving
    straggler = Future()
    with eng._lock:
        eng._closed = True
        eng._queue.put(None)
        eng._queue.put((_frames(1), "too late", straggler))
    gate.set()
    eng._thread.join(timeout=300)
    assert not eng._thread.is_alive()
    assert "answer" in blocker.result(timeout=5)
    with pytest.raises(RuntimeError, match="closed"):
        straggler.result(timeout=5)


def test_classifier_engine_answers_from_vocab():
    from sasvqa_tpu.tasks.serve import QAEngine
    vocab = {"yes": 0, "no": 1, "cat": 2}
    family, model, params, tok = _build("tiny-clip", num_labels=3)
    with QAEngine(model, params, family, tok, ans2label=vocab,
                  nframe=NFRAME, batch_size=2, linger_ms=5.0,
                  max_txt_len=8) as eng:
        res = eng.answer(_frames(0), "is it a cat?", timeout=300)
        assert res["label"] in vocab.values()
        assert res["answer"] == {v: k for k, v in vocab.items()}[
            res["label"]]
        # deterministic across calls (uniform policy, fixed seed)
        again = eng.answer(_frames(0), "is it a cat?", timeout=300)
        assert again == res
        assert eng.stats["requests"] == 2
    # closed engine refuses new work
    with pytest.raises(RuntimeError):
        eng.submit(_frames(0), "q")


def test_classifier_requires_vocab():
    from sasvqa_tpu.tasks.serve import QAEngine
    family, model, params, tok = _build("tiny-clip", num_labels=3)
    with pytest.raises(ValueError):
        QAEngine(model, params, family, tok, ans2label=None)


def test_serve_requests_bounded_window_and_order():
    """CLI request loop (serve_requests): answers land in request order,
    decode failures propagate, and the number of simultaneously-live
    decoded clips stays O(window), not O(len(requests)) — the r5 review
    found the previous decode-everything form held every clip at once."""
    import io
    import json as _json
    import time
    from concurrent.futures import Future

    from sasvqa_tpu.tasks.serve import serve_requests

    live = {"n": 0, "max": 0}
    lock = threading.Lock()

    class _Clip:
        def __init__(self):
            with lock:
                live["n"] += 1
                live["max"] = max(live["max"], live["n"])

        def release(self):
            with lock:
                live["n"] -= 1

    class _FakeEngine:
        def submit(self, frames, question):
            fut = Future()

            def resolve():
                time.sleep(0.002)
                frames.release()
                fut.set_result({"answer": question[::-1], "label": 0})

            threading.Thread(target=resolve, daemon=True).start()
            return fut

    reqs = [{"video": f"v{i}", "question": f"q{i}"} for i in range(100)]
    out = io.StringIO()
    batch_size, workers = 4, 2
    serve_requests(_FakeEngine(), reqs, lambda req: _Clip(), out,
                   batch_size=batch_size, decode_workers=workers)
    lines = [_json.loads(ln) for ln in out.getvalue().splitlines()]
    assert [ln["question"] for ln in lines] == [r["question"] for r in reqs]
    assert all(ln["answer"] == ln["question"][::-1] for ln in lines)
    window = max(4 * batch_size, 2 * workers)
    assert live["max"] <= window + 1, live["max"]

    def boom(req):
        raise OSError(f"decode failed: {req['video']}")

    with pytest.raises(OSError, match="decode failed"):
        serve_requests(_FakeEngine(), reqs[:3], boom, io.StringIO(),
                       batch_size=batch_size, decode_workers=workers)
