"""Measured baseline: the reference's compute pattern, naively in JAX.

The PyTorch reference publishes no numbers (its README is a 2-line
deprecation notice) and cannot run here (CUDA-only torch path), so
``bench.py``'s ``vs_baseline`` needed a measured denominator instead of
the round-1 documented estimate.  This script reproduces, on the SAME
chip and shapes as bench.py, what a straight port of the reference's
training-step structure costs:

- **per-frame Python-loop vision encode** — one ViT call per frame at
  batch B (reference MyGitModel loops frames,
  /root/reference/src/modeling/modeling.py:83-87), instead of one call
  at B*T that fills the MXU;
- **dense O(S^2) attention** (``flash=False``) — the reference has no
  attention kernels;
- **full-sequence LM head then slice** — reference computes vocab
  logits for every image+text position and slices text rows after
  (modeling.py:216-225);
- **synchronous H2D staging every step** — the live reference loop
  calls ``batch.cuda()`` inside forward_step with no prefetch overlap
  (run_video_qa.py:276-278);
- **a host sync every step** — the reference fetches ``loss.item()``
  into its RunningMeter each step (run_video_qa.py:481-486), draining
  the dispatch pipeline.

Two numbers are printed per shape: ``synced`` (per-step host fetch —
faithful to the reference loop, but over a tunneled chip the ~34 ms
round-trip inflates the penalty beyond what a local GPU would pay) and
``pipelined`` (sync once at the end).  BASELINE.md pins, per shape, the
FASTEST number observed in any run of EITHER variant as the denominator
(conservative: at the flagship shape the synced runs were actually
faster — the naive program's queued-step transients thrash HBM under
async dispatch — so 7.69 synced is the pin; msvd_base's best was
pipelined).  Every cost the pattern keeps (MXU underfill, dense
attention, full head, staging) is hardware-comparable, and a JAX/XLA
port is itself already faster than torch eager — so the true reference
is slower than this baseline and the reported speedup is a floor, not
a claim.

    python bench_naive_baseline.py            # both shapes
    python bench_naive_baseline.py flagship   # one shape
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _naive_model():
    from sasvqa_tpu.models.git import (GIT_BASE, GITForCausalLM,
                                       git_attention_bias)

    class NaiveGIT(GITForCausalLM):
        """GIT-base with the reference's per-frame encode loop and
        full-sequence LM head (citations in module docstring)."""

        def encode_frames(self, pixel_values):
            b, t = pixel_values.shape[:2]
            outs = []
            for i in range(t):          # unrolled: T separate B-sized
                feats, _, _ = self.image_encoder(pixel_values[:, i])
                outs.append(feats)      # ViT calls, MXU underfilled
            feats = jnp.concatenate(outs, axis=1)
            return self.visual_projection_ln(self.visual_projection(feats))

        def naive_loss(self, input_ids, attention_mask, pixel_values,
                       labels):
            b, l = input_ids.shape
            vis = self.encode_frames(pixel_values)
            m = vis.shape[1]
            txt = self.embed_text(input_ids, jnp.arange(l)[None, :])
            h = jnp.concatenate([vis, txt], axis=1)
            bias = git_attention_bias(m, attention_mask, dtype=self.dtype)
            for lyr in self.layer:
                h = lyr(h, bias=bias, deterministic=True)
            logits = self.output(h)          # full (B, M+L, V) head
            shifted = logits[:, m:-1, :].astype(jnp.float32)
            tgt = labels[:, 1:]
            valid = tgt != -100
            tgt_safe = jnp.where(valid, tgt, 0)
            logp = jax.nn.log_softmax(shifted, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt_safe[..., None],
                                       axis=-1)[..., 0]
            return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)

    return NaiveGIT(GIT_BASE, dtype=jnp.bfloat16, flash=False)


def measure(name, batch, frames, txt_len=32, steps=10):
    import optax
    model = _naive_model()
    rng = np.random.default_rng(0)
    ids_h = rng.integers(1, 1000, size=(batch, txt_len)).astype(np.int32)
    mask_h = np.ones_like(ids_h)
    labels_h = np.where(rng.random((batch, txt_len)) < 0.5, ids_h, -100)
    pixels_h = rng.normal(size=(batch, frames, 224, 224, 3)) \
        .astype(np.float32)

    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(ids_h),
                                 jnp.asarray(mask_h),
                                 jnp.asarray(pixels_h[:, :1]))
    tx = optax.adamw(1e-5)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, mask, pixels, labels):
        def loss_fn(p):
            return model.apply(p, ids, mask, pixels, labels,
                               method="naive_loss")
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def stage():
        # fresh H2D transfer each step, as the reference's in-step
        # .cuda() does (no prefetch overlap)
        return (jax.device_put(ids_h), jax.device_put(mask_h),
                jax.device_put(pixels_h), jax.device_put(labels_h))

    # compile + warm
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, *stage())
        float(loss)

    # (a) faithful loop: per-step staging AND per-step loss fetch
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, *stage())
        float(loss)                      # reference reads loss.item()
    dt_sync = (time.perf_counter() - t0) / steps

    # (b) pipelined variant: same compute pattern, one sync at the end
    # (removes the tunneled-chip round-trip artifact; see docstring)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, *stage())
    float(loss)
    dt_pipe = (time.perf_counter() - t0) / steps

    print(json.dumps({
        "config": name, "batch": batch, "frames": frames,
        "ms_per_step_synced": round(dt_sync * 1000, 1),
        "ms_per_step_pipelined": round(dt_pipe * 1000, 1),
        "qa_pairs_per_sec_synced": round(batch / dt_sync, 2),
        "qa_pairs_per_sec_pipelined": round(batch / dt_pipe, 2),
    }), flush=True)


SHAPES = {
    "flagship": lambda: measure("naive_git8_flagship", 16, 8),
    "msvd_base": lambda: measure("naive_git6_msvd_base", 6, 6),
}

if __name__ == "__main__":
    picks = sys.argv[1:] or list(SHAPES)
    for p in picks:
        SHAPES[p]()
