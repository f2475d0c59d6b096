"""Per-config train-step decomposition for the non-flagship bench rows.

``tools/profile_step.py`` decomposes the flagship (git8) step; this tool
gives the same treatment to the remaining BASELINE.md rows whose MFU has
no published attribution (VERDICT r3 #6/#7):

- ``clip1``  — msvd_qa_base3 class: CLIP ViT-B/16 classifier, B=8,
  1 frame (reference src/configs/msvd_qa_base3.json).
- ``mif2``   — msrvtt_qa_base2/3 class: GIT-base, B=16, 2 MIF frames.
- ``vitl16`` — stretch config: GIT + ViT-L/14, B=8, 16 frames, remat;
  includes the remat-policy sweep (full recompute vs dots-saveable vs
  no remat).

Measurement convention (CLAUDE.md): every probe runs N times inside one
jit chained by data dependency (lax.fori_loop), synced once by a host
fetch — per-call sync (~34 ms over the tunneled chip) amortises to zero.

Usage:  python -m sasvqa_tpu.tools.profile_config clip1 mif2 vitl16
        python -m sasvqa_tpu.tools.profile_config vitl16 --iters 4
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from sasvqa_tpu.tools.profile_step import timed

HBM_GBPS = 819.0  # v5e HBM bandwidth


def _adamw_floor_ms(params, passes: int = 7) -> float:
    """HBM floor of one f32 AdamW update: each param word is read as
    (param, grad, mu, nu) and written as (param, mu, nu) = 7 f32 passes
    (5 with bf16 moments)."""
    n = sum(l.size for l in jax.tree_util.tree_leaves(params))
    return n * 4 * passes / (HBM_GBPS * 1e9) * 1e3, n


def _report_params(name, params):
    floor, n = _adamw_floor_ms(params)
    print(f"{name}: {n / 1e6:.1f}M params; f32-AdamW HBM floor "
          f"{floor:.1f} ms (bf16 moments {floor * 5 / 7:.1f} ms)",
          flush=True)


def _adamw_probe(params, tx, opt_state, iters):
    import optax

    def adamw(carry):
        p, o = carry
        grads = jax.tree_util.tree_map(lambda a: a * 1e-3, p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    timed(adamw, ((params, opt_state),), iters, "adamw")


def _sgd_tree(vp, grads):
    return jax.tree_util.tree_map(lambda a, g: a - 1e-6 * g, vp, grads)


def clip1(it: int):
    """CLIP ViT-B/16 classifier, B=8, 1 frame, L=32 (bench_suite clip1)."""
    import optax
    from sasvqa_tpu.models.clip import (CLIP_VIT_B16, CLIPTextEncoder,
                                        CLIPVisionEncoder)
    from sasvqa_tpu.models.fusion import AnswerClassifier
    from sasvqa_tpu.models.video_qa import CLIPVideoQA, ClassifierHeadConfig

    print("== clip1 (CLIP ViT-B/16 cls, B=8, 1 frame, L=32) ==", flush=True)
    B, T, L, IMG = 8, 1, 32, 224
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    tc, vc = CLIP_VIT_B16

    ids = jnp.asarray(rng.integers(1, 1000, size=(B, L)), jnp.int32)
    mask = jnp.ones_like(ids)
    pixels = jnp.asarray(rng.normal(size=(B, T, IMG, IMG, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(B,)), jnp.int32)

    model = CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=1000),
                        dtype=dt)
    params = jax.jit(model.init)(key, ids, mask, pixels)
    _report_params("clip1", params)
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
               it, "step")
    print(f"{'':>10}  = {B / (ms / 1e3):.1f} qa-pairs/s", flush=True)

    # vision tower fwd+bwd with param grads (the classifier consumes the
    # projected image_embeds — with_projection=True, video_qa.py:69-71)
    venc = CLIPVisionEncoder(vc, dtype=dt, with_projection=True)
    flat = pixels.reshape(B * T, IMG, IMG, 3)
    vparams = jax.jit(venc.init)(key, flat[:2])

    def vis_tower(vp, flat):
        def f(p):
            _, _, emb = venc.apply(p, flat)
            return (emb.astype(jnp.float32) ** 2).mean()
        return _sgd_tree(vp, jax.grad(f)(vp))

    # proj-matmul flops only (attention at S=197 adds ~5%), x3 fwd+bwd
    d, ff = vc.hidden_size, vc.intermediate_size
    toks = B * T * 197
    vis_tflop = 3 * toks * vc.num_layers * (4 * d * d + 2 * d * ff) * 2 / 1e12
    timed(vis_tower, (vparams, flat), it, "vis_tower", tflop=vis_tflop)

    # text tower fwd+bwd with param grads
    tenc = CLIPTextEncoder(tc, dtype=dt)
    tparams = jax.jit(tenc.init)(key, ids, mask)

    def txt_tower(tp, ids, mask):
        def f(p):
            h, _ = tenc.apply(p, ids, mask)
            return (h.astype(jnp.float32) ** 2).mean()
        return _sgd_tree(tp, jax.grad(f)(tp))

    dtx, fftx = tc.hidden_size, tc.intermediate_size
    txt_tflop = (3 * B * L * tc.num_layers
                 * (4 * dtx * dtx + 2 * dtx * fftx) * 2 / 1e12)
    timed(txt_tower, (tparams, ids, mask), it * 4, "txt_tower",
          tflop=txt_tflop)

    # fusion head + classifier fwd+bwd
    head = AnswerClassifier(num_labels=1000, dtype=dt)
    txt_h = jnp.asarray(rng.normal(size=(B, L, dtx)), dt)
    vis_e = jnp.asarray(rng.normal(size=(B, T, dtx)), dt)
    hparams = jax.jit(head.init)(key, txt_h, mask, vis_e)

    def fusion(carry):
        hp, txt_h = carry
        def f(hp, txt_h):
            lg = head.apply(hp, txt_h, mask, vis_e)
            return (lg ** 2).mean()
        g_hp, g_t = jax.grad(f, argnums=(0, 1))(hp, txt_h)
        return (_sgd_tree(hp, g_hp), txt_h - 1e-6 * g_t)

    timed(fusion, ((hparams, txt_h),), it * 4, "fusion")

    _adamw_probe(params, tx, opt_state, it * 4)


def mif2(it: int):
    """GIT-base, B=16, 2 frames (msrvtt_qa_base2/3 MIF class)."""
    import optax
    from sasvqa_tpu.models.clip import CLIPVisionEncoder
    from sasvqa_tpu.models.git import (GIT_BASE, GITForCausalLM, GitLayer,
                                       git_attention_bias)

    print("== mif2 (GIT-base, B=16, 2 frames, L=32) ==", flush=True)
    B, T, L, IMG = 16, 2, 32, 224
    D = GIT_BASE.hidden_size
    M = T * GIT_BASE.tokens_per_frame          # 394
    S = M + L                                  # 426 < 512 -> dense path
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    ids = jnp.asarray(rng.integers(1, 1000, size=(B, L)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.where(jnp.asarray(rng.random((B, L))) < 0.5, ids, -100)
    pixels = jnp.asarray(rng.normal(size=(B, T, IMG, IMG, 3)), jnp.float32)

    model = GITForCausalLM(GIT_BASE, dtype=dt)
    params = jax.jit(model.init)(key, ids, mask, pixels[:, :1])
    _report_params("mif2", params)
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
               it, "step")
    print(f"{'':>10}  = {B / (ms / 1e3):.1f} qa-pairs/s", flush=True)

    # vision tower (32 images, GIT flavor)
    venc = CLIPVisionEncoder(GIT_BASE.vision, dtype=dt,
                             post_ln_all_tokens=True, with_projection=False)
    flat = pixels.reshape(B * T, IMG, IMG, 3)
    vparams = jax.jit(venc.init)(key, flat[:2])

    def vis_tower(vp, flat):
        def f(p):
            feats, _, _ = venc.apply(p, flat)
            return (feats.astype(jnp.float32) ** 2).mean()
        return _sgd_tree(vp, jax.grad(f)(vp))

    vcfg = GIT_BASE.vision
    vis_tflop = (3 * B * T * 197 * vcfg.num_layers
                 * (4 * vcfg.hidden_size ** 2
                    + 2 * vcfg.hidden_size * vcfg.intermediate_size) * 2
                 / 1e12)
    timed(vis_tower, (vparams, flat), it, "vis_tower", tflop=vis_tflop)

    # text stack at S=426: below the 512 flash threshold, dense-bias path
    lyr = GitLayer(GIT_BASE, dtype=dt)
    h0 = jnp.asarray(rng.normal(size=(B, S, D)), dt)
    bias = git_attention_bias(M, mask, dtype=dt)
    lparams = jax.jit(lambda k, h, b: lyr.init(k, h, b))(key, h0, bias)

    def txt_stack(carry):
        h, lp = carry
        def f(h, lp):
            o = h
            for _ in range(GIT_BASE.num_layers):
                o = lyr.apply(lp, o, bias=bias)
            return (o.astype(jnp.float32) ** 2).mean()
        gh, glp = jax.grad(f, argnums=(0, 1))(h, lp)
        return (h - 1e-6 * gh, _sgd_tree(lp, glp))

    txt_tflop = (GIT_BASE.num_layers * 3
                 * (4 * D * D + 2 * D * GIT_BASE.intermediate_size)
                 * 2 * B * S / 1e12)
    timed(txt_stack, ((h0, lparams),), it, "txt_stack", tflop=txt_tflop)

    # logits + CE tail (L text positions only)
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

    timed(logits_probe, ((ht, wv),), it * 4, "logits",
          tflop=3 * 2 * B * (L - 1) * D * V / 1e12)

    _adamw_probe(params, tx, opt_state, it * 4)


def vitl16(it: int, policies=("none", "dots_with_no_batch_dims_saveable",
                              "noremat")):
    """GIT + ViT-L/14, B=8, 16 frames (stretch config class), remat.

    Includes the remat-policy sweep the r3 verdict asked for: shipped
    full-recompute remat vs policy-saveable variants vs no remat (each
    may compile-OOM; failures are reported, not fatal).
    """
    import dataclasses as dc

    import optax
    from sasvqa_tpu.models.clip import CLIP_VIT_L14, CLIPVisionEncoder
    from sasvqa_tpu.models.git import (GIT_BASE, GITForCausalLM, GitLayer)
    from sasvqa_tpu.ops.git_flash import git_flash_attention

    print("== vitl16 (GIT+ViT-L/14, B=8, 16 frames, L=32, remat) ==",
          flush=True)
    B, T, L, IMG = 8, 16, 32, 224
    vcfg = CLIP_VIT_L14[1]
    cfg = dc.replace(GIT_BASE, vision=vcfg)
    P = cfg.tokens_per_frame                   # 257 at patch 14
    M = T * P
    S = M + L                                  # 4144
    D = cfg.hidden_size
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    ids = jnp.asarray(rng.integers(1, 1000, size=(B, L)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.where(jnp.asarray(rng.random((B, L))) < 0.5, ids, -100)
    pixels = jnp.asarray(rng.normal(size=(B, T, IMG, IMG, 3)), jnp.float32)

    model = GITForCausalLM(cfg, dtype=dt, remat=True)
    params = jax.jit(model.init)(key, ids, mask, pixels[:, :1])
    _report_params("vitl16", params)
    tx = optax.adamw(1e-5)
    opt_state = tx.init(params)

    def mk_step(m):
        def step(carry, ids, mask, pixels, labels):
            params, opt_state = carry
            def loss_fn(p):
                return m.apply(p, ids, mask, pixels, labels=labels,
                               deterministic=True)["loss"]
            _, grads = jax.value_and_grad(loss_fn)(params)
            updates, o = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), o
        return step

    ms = timed(mk_step(model), ((params, opt_state), ids, mask, pixels,
                                labels), it, "step")
    print(f"{'':>10}  = {B / (ms / 1e3):.1f} qa-pairs/s", flush=True)

    # ---- vision tower remat sweep (128 ViT-L images) --------------------
    flat = pixels.reshape(B * T, IMG, IMG, 3)
    vis_tflop_fwd = (B * T * P * vcfg.num_layers
                     * (4 * vcfg.hidden_size ** 2
                        + 2 * vcfg.hidden_size * vcfg.intermediate_size)
                     * 2 / 1e12)
    for pol in policies:
        if pol == "noremat":
            venc = CLIPVisionEncoder(vcfg, dtype=dt, post_ln_all_tokens=True,
                                     with_projection=False, remat=False)
            label, mult = "vt_noremat", 3.0
        elif pol == "none":
            venc = CLIPVisionEncoder(vcfg, dtype=dt, post_ln_all_tokens=True,
                                     with_projection=False, remat=True)
            label, mult = "vt_remat", 4.0   # bwd recomputes the full fwd
        else:
            venc = CLIPVisionEncoder(vcfg, dtype=dt, post_ln_all_tokens=True,
                                     with_projection=False, remat=True,
                                     remat_policy=pol)
            label, mult = f"vt_{pol[:10]}", 3.0
        vparams = jax.jit(venc.init)(key, flat[:2])

        def vis_tower(vp, flat, _venc=venc):
            def f(p):
                feats, _, _ = _venc.apply(p, flat)
                return (feats.astype(jnp.float32) ** 2).mean()
            return _sgd_tree(vp, jax.grad(f)(vp))

        try:
            timed(vis_tower, (vparams, flat), max(it // 2, 2), label,
                  tflop=mult * vis_tflop_fwd)
        except Exception as e:  # compile OOM is expected for some rows
            print(f"{label:>10}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)

    # ---- text flash attention alone at S=4144 ----------------------------
    H, DH = cfg.num_heads, D // cfg.num_heads
    qt = jnp.asarray(rng.normal(size=(B, H, S, DH)), dt)
    kt = jnp.asarray(rng.normal(size=(B, H, S, DH)), dt)
    vt = jnp.asarray(rng.normal(size=(B, H, S, DH)), dt)

    def txt_flash(carry):
        qt, kt, vt = carry
        def f(qt, kt, vt):
            o = qt
            for _ in range(cfg.num_layers):
                o = git_flash_attention(o, kt, vt, mask, M)
            return (o.astype(jnp.float32) ** 2).mean()
        g = jax.grad(f, argnums=(0, 1, 2))(qt, kt, vt)
        return (qt - 1e-6 * g[0], kt - 1e-6 * g[1], vt - 1e-6 * g[2])

    flash_tflop = cfg.num_layers * 3.5 * 4 * B * H * S * S * DH / 1e12
    timed(txt_flash, ((qt, kt, vt),), max(it // 2, 2), "txt_flash",
          tflop=flash_tflop)

    # ---- text layer stack (6 GIT layers incl. flash) ---------------------
    lyr = GitLayer(cfg, dtype=dt)
    h0 = jnp.asarray(rng.normal(size=(B, S, D)), dt)
    lparams = jax.jit(lambda k, h, m: lyr.init(k, h, None, True, None,
                                               (M, m)))(key, h0, mask)

    def txt_stack(carry):
        h, lp = carry
        def f(h, lp):
            o = h
            for _ in range(cfg.num_layers):
                o = lyr.apply(lp, o, git_mask=(M, mask))
            return (o.astype(jnp.float32) ** 2).mean()
        gh, glp = jax.grad(f, argnums=(0, 1))(h, lp)
        return (h - 1e-6 * gh, _sgd_tree(lp, glp))

    txt_tflop = (cfg.num_layers * 3
                 * (4 * D * D + 2 * D * cfg.intermediate_size)
                 * 2 * B * S / 1e12)
    timed(txt_stack, ((h0, lparams),), max(it // 2, 2), "txt_stack",
          tflop=txt_tflop)

    _adamw_probe(params, tx, opt_state, it * 2)


CONFIGS = {"clip1": clip1, "mif2": mif2, "vitl16": vitl16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=list(CONFIGS))
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    for name in (args.configs or list(CONFIGS)):
        CONFIGS[name](args.iters)


if __name__ == "__main__":
    main()
