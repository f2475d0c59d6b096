"""Train-step decomposition profiler for the flagship GIT-base config.

Times each compute component of the bench.py train step in isolation so
perf work targets the biggest non-speed-of-light bucket.  Every probe is
measured with the repo's tunnel-safe convention (CLAUDE.md): the probed
fn runs N times *inside one jit* chained by data dependency
(lax.fori_loop), so host sync cost (~34 ms over the tunneled chip) and
per-call dispatch are amortised to zero; timing is (run2 - 0)/N after a
warmup call compiles.

Usage:  python -m sasvqa_tpu.tools.profile_step [--iters 8]

Probes (fwd+bwd where marked):
  step        full train step (fwd+bwd+adamw)         -- the bench number
  vis_tower   vision encoder on 128 images            (fwd+bwd)
  vis_attn    12x vision attention block S=197        (fwd+bwd, q/k/v grads)
  txt_flash   6x git_flash_attention alone S=1608     (fwd+bwd, q/k/v grads)
  txt_stack   6x GIT text layers S=1608, flash mask   (fwd+bwd, +param grads)
  logits      vocab projection + CE on text positions (fwd+bwd)
  adamw       optimizer update alone (full param tree)
  embed       word+pos embedding gather               (fwd+bwd)
  mm_768      dense-matmul ceiling probe at K=768
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, T, IMG, L = 16, 8, 224, 32
D, DV, HEADS, DH = 768, 768, 12, 64
VIS_LAYERS, TXT_LAYERS = 12, 6
P_TOK = 197                  # patches + cls at 224/16
M = T * P_TOK                # visual prefix length
S = M + L                    # combined sequence


def timed(fn, args, iters, name, tflop=None):
    """fn: (carry, *args) -> carry with carry a pytree of arrays."""

    @jax.jit
    def loop(carry, *a):
        return jax.lax.fori_loop(0, iters, lambda _, c: fn(c, *a), carry)

    @jax.jit
    def _touch_all(out):
        # one scalar of EVERY output leaf reduced on device: independent
        # output buffers complete independently (core/profiling.synced
        # rationale), so syncing only one leaf could stop the timer while
        # other fori_loop outputs are still in flight (ADVICE r2).  A
        # per-leaf host fetch would cost ~34 ms x n_leaves; this costs
        # one fetch.
        return sum(l.ravel()[0].astype(jnp.float32)
                   for l in jax.tree_util.tree_leaves(out)
                   if getattr(l, "size", 0))

    def sync(out):
        return float(_touch_all(out))

    carry = args[0]
    rest = args[1:]
    sync(loop(carry, *rest))                     # compile + warm run
    t0 = time.perf_counter()
    out = loop(carry, *rest)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    rate = f"  {tflop / (ms / 1e3):7.1f} TF/s" if tflop else ""
    print(f"{name:>10}: {ms:8.2f} ms{rate}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    it = args.iters

    from sasvqa_tpu.models.git import GIT_BASE, GITForCausalLM, GitLayer
    from sasvqa_tpu.models.clip import CLIPVisionEncoder
    from sasvqa_tpu.ops.attention import dot_product_attention
    from sasvqa_tpu.ops.git_flash import git_flash_attention

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    dt = jnp.bfloat16

    # ---- full step -----------------------------------------------------
    import optax
    model = GITForCausalLM(GIT_BASE, dtype=dt)
    ids = jnp.asarray(rng.integers(1, 1000, size=(B, L)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.where(jnp.asarray(rng.random((B, L))) < 0.5, ids, -100)
    pixels = jnp.asarray(rng.normal(size=(B, T, IMG, IMG, 3)), jnp.float32)
    params = jax.jit(model.init)(key, ids, mask, pixels[:, :1])
    tx = optax.adamw(1e-5)
    opt_state = tx.init(params)

    def step(carry, ids, mask, pixels, labels):
        params, opt_state = carry
        def loss_fn(p):
            return model.apply(p, ids, mask, pixels, labels=labels,
                               deterministic=True)["loss"]
        _, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    ms = timed(step, ((params, opt_state), ids, mask, pixels, labels),
               it, "step", tflop=21.5)
    print(f"{'':>10}  = {B / (ms / 1e3):.1f} qa-pairs/s", flush=True)

    # ---- vision tower --------------------------------------------------
    venc = CLIPVisionEncoder(GIT_BASE.vision, dtype=dt,
                             post_ln_all_tokens=True, with_projection=False)
    flat = pixels.reshape(B * T, IMG, IMG, 3)
    vparams = jax.jit(venc.init)(key, flat[:2])

    def vis_tower(vp, flat):
        def f(p):
            feats, _, _ = venc.apply(p, flat)
            return (feats.astype(jnp.float32) ** 2).mean()
        return jax.tree_util.tree_map(
            lambda a, g: a - 1e-6 * g, vp, jax.grad(f)(vp))

    timed(vis_tower, (vparams, flat), it, "vis_tower", tflop=12.9)

    # ---- vision attention core (12 layers' worth) ----------------------
    q = jnp.asarray(rng.normal(size=(B * T, HEADS, P_TOK, DH)), dt)
    k = jnp.asarray(rng.normal(size=(B * T, HEADS, P_TOK, DH)), dt)
    v = jnp.asarray(rng.normal(size=(B * T, HEADS, P_TOK, DH)), dt)

    def vis_attn(carry):
        # carry ALL THREE tensors and apply all three grads: a carry of
        # q alone lets XLA dead-code-eliminate the dK/dV computation
        # (measured: it strips the split-backward's whole dKV kernel),
        # silently timing a fraction of the real backward
        q, k, v = carry
        def f(q, k, v):
            o = q
            for _ in range(VIS_LAYERS):
                o = dot_product_attention(o, k, v)
            return (o.astype(jnp.float32) ** 2).mean()
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        return (q - 1e-6 * g[0], k - 1e-6 * g[1], v - 1e-6 * g[2])

    # 3.0x fwd matmul flops: this short-seq path is XLA dense attention
    # (stored P), fwd 2 + bwd 4 matmuls.  (The old 2.5x went with the
    # dq-only carry that let XLA strip the dK/dV work.)
    attn_tflop = VIS_LAYERS * 3.0 * 4 * B * T * HEADS * P_TOK * P_TOK * DH / 1e12
    timed(vis_attn, ((q, k, v),), it, "vis_attn", tflop=attn_tflop)

    # ---- text flash attention (6 layers' worth) ------------------------
    qt = jnp.asarray(rng.normal(size=(B, HEADS, S, DH)), dt)
    kt = jnp.asarray(rng.normal(size=(B, HEADS, S, DH)), dt)
    vt = jnp.asarray(rng.normal(size=(B, HEADS, S, DH)), dt)

    def txt_flash(carry):
        qt, kt, vt = carry                  # all grads live (see vis_attn)
        def f(qt, kt, vt):
            o = qt
            for _ in range(TXT_LAYERS):
                o = git_flash_attention(o, kt, vt, mask, M)
            return (o.astype(jnp.float32) ** 2).mean()
        g = jax.grad(f, argnums=(0, 1, 2))(qt, kt, vt)
        return (qt - 1e-6 * g[0], kt - 1e-6 * g[1], vt - 1e-6 * g[2])

    # 3.5x fwd matmul flops: fused flash bwd = recompute QK + 4 grad
    # matmuls (git_flash._fused_bwd_kernel), fwd 2 — 7 total
    flash_tflop = TXT_LAYERS * 3.5 * 4 * B * HEADS * S * S * DH / 1e12
    timed(txt_flash, ((qt, kt, vt),), it, "txt_flash", tflop=flash_tflop)

    # ---- text layer stack (6 GIT layers incl. flash) --------------------
    lyr = GitLayer(GIT_BASE, dtype=dt)
    h0 = jnp.asarray(rng.normal(size=(B, S, D)), dt)
    # (M, mask) must NOT cross the jit boundary as an argument: jit would
    # trace M and git_flash takes num_img as a static nondiff arg
    lparams = jax.jit(lambda k, h, m: lyr.init(k, h, None, True, None,
                                               (M, m)))(key, h0, mask)

    def txt_stack(carry):
        h, lp = carry
        def f(h, lp):
            o = h
            for _ in range(TXT_LAYERS):
                o = lyr.apply(lp, o, git_mask=(M, mask))
            return (o.astype(jnp.float32) ** 2).mean()
        # grads wrt params too: a real step computes the dW matmuls
        gh, glp = jax.grad(f, argnums=(0, 1))(h, lp)
        return (h - 1e-6 * gh,
                jax.tree_util.tree_map(lambda a, g: a - 1e-6 * g, lp, glp))

    # 6 layers x (4 proj DxD + MLP 2x D x 4D) x 2 FLOP x tokens, x3 fwd+bwd
    txt_tflop = TXT_LAYERS * 3 * (4 * D * D + 2 * D * 4 * D) * 2 * B * S / 1e12
    timed(txt_stack, ((h0, lparams),), it, "txt_stack", tflop=txt_tflop)

    # ---- logits + CE tail (vocab proj on text positions, fwd+bwd) -------
    V = GIT_BASE.vocab_size
    ht = jnp.asarray(rng.normal(size=(B, L, D)), dt)
    wv = jnp.asarray(rng.normal(size=(D, V)) * 0.02, dt)

    def logits_probe(carry):
        ht, wv = carry
        def f(ht, wv):
            sh = (ht[:, :-1, :] @ wv).astype(jnp.float32)
            tgt = labels[:, 1:]
            valid = tgt != -100
            lp = jax.nn.log_softmax(sh, axis=-1)
            nll = -jnp.take_along_axis(
                lp, jnp.where(valid, tgt, 0)[..., None], axis=-1)[..., 0]
            return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
        gh, gw = jax.grad(f, argnums=(0, 1))(ht, wv)
        return (ht - 1e-6 * gh, wv - 1e-6 * gw)

    logit_tflop = 3 * 2 * B * (L - 1) * D * V / 1e12
    timed(logits_probe, ((ht, wv),), it * 4, "logits", tflop=logit_tflop)

    # ---- optimizer update alone (full GIT-base param tree) ---------------
    def adamw_probe(carry):
        p, o = carry
        grads = jax.tree_util.tree_map(lambda a: a * 1e-3, p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    timed(adamw_probe, ((params, opt_state),), it * 4, "adamw")

    # ---- embeddings tail: word+pos gather (fwd+bwd wrt the table) --------
    def embed_probe(emb):
        def g(emb):
            x = emb[ids] + emb[:L]
            return (x.astype(jnp.float32) ** 2).mean()
        return emb - 1e-6 * jax.grad(g)(emb)

    emb_tbl = jnp.asarray(rng.normal(size=(V, D)), dt)
    timed(embed_probe, (emb_tbl,), it * 4, "embed")

    # ---- matmul ceiling probe (same token count, K=768) ------------------
    x = jnp.asarray(rng.normal(size=(B * S, D)), dt)
    w = jnp.asarray(rng.normal(size=(D, 4 * D)), dt)

    def mm(x, w):
        y = x @ w
        return (y @ w.T) * 1e-3

    mm_tflop = 2 * 2 * B * S * D * 4 * D / 1e12
    timed(mm, (x, w), it * 4, "mm_768", tflop=mm_tflop)


if __name__ == "__main__":
    main()
