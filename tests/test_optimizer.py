"""Optimizer param grouping + schedules (SURVEY §2.1 #21/#22)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sasvqa_tpu.core.config import ConfigDict
from sasvqa_tpu.train.schedules import get_lr_schedule
from sasvqa_tpu.train.steps import (decay_mask, lr_mul_mask, make_optimizer)


def _params():
    return {
        "encoder": {
            "layers_0": {
                "self_attn": {"qkv": {"kernel": jnp.ones((8, 24)),
                                      "bias": jnp.zeros(24)}},
                "layer_norm1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
            },
            "token_embedding": {"embedding": jnp.ones((10, 8))},
        },
        "classifier": {"kernel": jnp.ones((8, 5)), "bias": jnp.zeros(5)},
    }


def test_decay_mask_matches_reference_no_decay_sets():
    """Reference no_decay = bias + LayerNorm.{weight,bias} ONLY
    (optimization/utils.py:124) — embeddings DO get weight decay."""
    mask = decay_mask(_params())
    assert mask["classifier"]["kernel"] is True
    assert mask["classifier"]["bias"] is False
    enc = mask["encoder"]
    assert enc["layers_0"]["self_attn"]["qkv"]["kernel"] is True
    assert enc["layers_0"]["self_attn"]["qkv"]["bias"] is False
    assert enc["layers_0"]["layer_norm1"]["scale"] is False
    assert enc["layers_0"]["layer_norm1"]["bias"] is False
    assert enc["token_embedding"]["embedding"] is True


def test_adamw_step_matches_torch_reference_groups():
    """One AdamW step == torch.optim.AdamW with the reference's param
    groups (decay on everything except bias/LayerNorm,
    optimization/utils.py:96-153; live loop uses torch.optim.AdamW via
    getattr, run_video_qa.py:415-422)."""
    import torch

    lr, wd, betas, eps = 2e-3, 0.1, (0.9, 0.98), 1e-8
    rng = np.random.default_rng(3)
    shapes = {
        ("dense", "kernel"): (6, 4), ("dense", "bias"): (4,),
        ("layer_norm", "scale"): (6,), ("layer_norm", "bias"): (6,),
        ("embed", "embedding"): (9, 6),
    }
    vals = {k: rng.normal(size=s).astype(np.float32)
            for k, s in shapes.items()}
    gvals = {k: rng.normal(size=s).astype(np.float32)
             for k, s in shapes.items()}

    # --- torch side: reference grouping by name fragments
    torch_name = {("dense", "kernel"): "dense.weight",
                  ("dense", "bias"): "dense.bias",
                  ("layer_norm", "scale"): "LayerNorm.weight",
                  ("layer_norm", "bias"): "LayerNorm.bias",
                  ("embed", "embedding"): "embeddings.word_embeddings.weight"}
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in vals.items()}
    groups = [
        {"params": [p for k, p in tparams.items()
                    if not any(nd in torch_name[k] for nd in no_decay)],
         "weight_decay": wd},
        {"params": [p for k, p in tparams.items()
                    if any(nd in torch_name[k] for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=lr, betas=betas, eps=eps)
    for k, p in tparams.items():
        p.grad = torch.from_numpy(gvals[k].copy())
    opt.step()

    # --- jax side
    def nest(d):
        out = {}
        for (mod, leaf), v in d.items():
            out.setdefault(mod, {})[leaf] = jnp.asarray(v)
        return out

    params, grads = nest(vals), nest(gvals)
    cfg = ConfigDict(dict(optim="adamw", learning_rate=lr, weight_decay=wd,
                          betas=list(betas), num_train_epochs=1,
                          gradient_accumulation_steps=1, grad_norm=-1,
                          decay="constant"))
    tx = make_optimizer(cfg, total_steps=10, params=params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    for (mod, leaf), _ in shapes.items():
        np.testing.assert_allclose(
            np.asarray(new[mod][leaf]),
            tparams[(mod, leaf)].detach().numpy(),
            rtol=1e-5, atol=1e-6, err_msg=f"{mod}/{leaf}")


def test_adamw_bf16_moments_tracks_f32_and_stores_bf16():
    """--adamw_moment_dtype bf16 (opt-in divergence, PARITY.md): the
    moments are STORED bf16 but the trajectory must track the f32 path
    closely, and the f32 instantiation of the custom transform must be
    step-for-step identical to optax.adamw's scale_by_adam."""
    from sasvqa_tpu.train.steps import _scale_by_adam_lowp

    rng = np.random.default_rng(7)
    params = {"dense": {"kernel": jnp.asarray(
                  rng.normal(size=(16, 8)).astype(np.float32)),
                        "bias": jnp.zeros(8)}}
    base = dict(optim="adamw", learning_rate=1e-3, weight_decay=0.05,
                betas=[0.9, 0.98], num_train_epochs=1,
                gradient_accumulation_steps=1, grad_norm=-1,
                decay="constant")
    tx32 = make_optimizer(ConfigDict(dict(base)), 100, params=params)
    tx16 = make_optimizer(
        ConfigDict(dict(base, adamw_moment_dtype="bf16")), 100,
        params=params)

    s32, s16 = tx32.init(params), tx16.init(params)
    p32, p16 = params, params
    for i in range(20):
        grads = {"dense": {"kernel": jnp.asarray(
                     rng.normal(size=(16, 8)).astype(np.float32)),
                           "bias": jnp.asarray(
                     rng.normal(size=(8,)).astype(np.float32))}}
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u16)

    # stored dtypes: both moments bf16 (that's the whole point)
    def _find_adam(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s
        if isinstance(s, (tuple, list)):
            for x in s:
                r = _find_adam(x)
                if r is not None:
                    return r
        return None

    adam_state = _find_adam(s16)
    assert adam_state is not None
    assert adam_state.mu["dense"]["kernel"].dtype == jnp.bfloat16
    assert adam_state.nu["dense"]["kernel"].dtype == jnp.bfloat16
    # trajectory after 20 steps within bf16 rounding of the f32 path
    diff = float(jnp.abs(p16["dense"]["kernel"]
                         - p32["dense"]["kernel"]).max())
    scale = float(jnp.abs(p32["dense"]["kernel"]).max())
    assert diff < 2e-2 * scale, diff

    # f32 instantiation == optax.scale_by_adam exactly (formulation pin)
    ref = optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-8)
    own = _scale_by_adam_lowp(0.9, 0.98, eps=1e-8,
                              moment_dtype=jnp.float32)
    sr, so = ref.init(params), own.init(params)
    pr = params
    for i in range(3):
        g = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 0.1 * (i + 1)), pr)
        ur, sr = ref.update(g, sr, pr)
        uo, so = own.update(g, so, pr)
        np.testing.assert_array_equal(
            np.asarray(ur["dense"]["kernel"]),
            np.asarray(uo["dense"]["kernel"]))


def test_adamw_bf16_moments_checkpoint_roundtrip(tmp_path):
    """bf16 moments must survive the TrainingRestorer save/restore
    (Orbax StandardRestore against a bf16-leaved template): a resumed
    run continues the EXACT trajectory of an uninterrupted one."""
    from sasvqa_tpu.core.checkpoint import TrainingRestorer

    params = {"w": jnp.asarray(
        np.random.default_rng(3).normal(size=(8, 4)).astype(np.float32))}
    cfg = ConfigDict(dict(optim="adamw", learning_rate=1e-3,
                          weight_decay=0.01, betas=[0.9, 0.999],
                          num_train_epochs=1, grad_norm=-1,
                          gradient_accumulation_steps=1,
                          decay="constant", adamw_moment_dtype="bf16"))
    tx = make_optimizer(cfg, 50, params=params)

    class S:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

        def replace(self, **kw):
            d = dict(params=self.params, opt_state=self.opt_state,
                     step=self.step)
            d.update(kw)
            return S(**d)

    def upd(s, seed):
        g = {"w": jnp.asarray(np.random.default_rng(seed).normal(
            size=(8, 4)).astype(np.float32))}
        u, new_opt = tx.update(g, s.opt_state, s.params)
        return S(optax.apply_updates(s.params, u), new_opt,
                 s.step + jnp.ones_like(s.step))

    s = S(params, tx.init(params), jnp.zeros([], jnp.int32))
    for i in range(3):
        s = upd(s, i)

    restorer = TrainingRestorer(str(tmp_path / "out"), save_steps=1)
    restorer.force_save(3, s)
    restorer.wait()
    fresh = S(params, tx.init(params), jnp.zeros([], jnp.int32))
    resumed = restorer.restore_into(fresh)
    restorer.close()

    def moment_leaves(opt_state):
        return [l for l in jax.tree_util.tree_leaves(opt_state)
                if getattr(l, "dtype", None) == jnp.bfloat16]

    assert len(moment_leaves(resumed.opt_state)) == 2  # mu + nu
    for a, b in zip(jax.tree_util.tree_leaves(resumed.opt_state),
                    jax.tree_util.tree_leaves(s.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continued trajectories identical
    cont, uncont = upd(resumed, 99), upd(s, 99)
    np.testing.assert_array_equal(np.asarray(cont.params["w"]),
                                  np.asarray(uncont.params["w"]))


def test_lr_value_matches_schedules():
    """The host-side lr mirror (train/lr logging) must agree with the
    jitted schedules for every decay type over a step sweep."""
    from sasvqa_tpu.train.schedules import lr_value
    total = 40
    cases = [
        ("constant", {}),
        ("multi_step", {"milestones": [5, 17], "gamma": 0.3}),
        ("linear", {"warmup_ratio": 0.2}),
        ("invsqrt", {"warmup_ratio": 0.1}),
    ]
    for decay, kw in cases:
        sched = get_lr_schedule(decay, 3e-4, total_steps=total,
                                warmup_ratio=kw.get("warmup_ratio", 0.1),
                                milestones=kw.get("milestones"),
                                gamma=kw.get("gamma", 0.5))
        for step in range(0, total + 5):
            dev = float(sched(jnp.asarray(step)))
            host = lr_value(decay, 3e-4, step, total_steps=total,
                            warmup_ratio=kw.get("warmup_ratio", 0.1),
                            milestones=kw.get("milestones"),
                            gamma=kw.get("gamma", 0.5))
            np.testing.assert_allclose(host, dev, rtol=1e-6,
                                       err_msg=f"{decay} step {step}")


def test_lr_at_matches_applied_lr():
    """lr_at(cfg, total, gs) must equal the lr the optimizer actually
    applied at global step gs — verified by recovering the applied lr
    from a pure-SGD chain trajectory under both formulations."""
    from sasvqa_tpu.train.steps import lr_at
    total = 8
    cfg = ConfigDict(optim="sgd", learning_rate=1e-2, decay="multi_step",
                     step_decay_epochs=[1], num_train_epochs=2, gamma=0.5,
                     grad_norm=-1, gradient_accumulation_steps=1)
    tx = make_optimizer(cfg, total)
    params = {"w": jnp.zeros(1)}
    st = tx.init(params)
    g = {"w": jnp.ones(1)}
    prev = params["w"]
    for gs in range(1, total + 1):
        u, st = tx.update(g, st, params)
        applied = -float(u["w"][0])  # lr * unit grad
        np.testing.assert_allclose(applied, lr_at(cfg, total, gs),
                                   rtol=1e-6, err_msg=f"gs={gs}")


def test_restore_formulation_mismatch_guard(tmp_path):
    """scan-accum and MultiSteps opt states are structurally different
    (PARITY divergence #13); a resume across the mismatch must raise a
    NAMED error instead of Orbax's opaque tree failure or a silent
    mis-restore (VERDICT r4 weak #4)."""
    import pytest
    from sasvqa_tpu.core.checkpoint import (FormulationMismatchError,
                                            TrainingRestorer)

    params = {"w": jnp.asarray(
        np.random.default_rng(7).normal(size=(4, 3)).astype(np.float32))}
    base = dict(optim="adamw", learning_rate=1e-3, weight_decay=0.01,
                betas=[0.9, 0.999], num_train_epochs=1, grad_norm=-1,
                gradient_accumulation_steps=4, decay="constant")
    tx_ms = make_optimizer(ConfigDict(dict(base, scan_accum=0)), 50,
                           params=params)
    tx_scan = make_optimizer(ConfigDict(dict(base, scan_accum=1)), 50,
                             params=params)

    class S:
        def __init__(self, params, opt_state, step):
            self.params, self.opt_state, self.step = params, opt_state, step

        def replace(self, **kw):
            d = dict(params=self.params, opt_state=self.opt_state,
                     step=self.step)
            d.update(kw)
            return S(**d)

    step0 = jnp.zeros([], jnp.int32)

    # MultiSteps checkpoint -> scan-accum resume: named error
    out_ms = str(tmp_path / "ms")
    r = TrainingRestorer(out_ms, save_steps=1)
    r.force_save(1, S(params, tx_ms.init(params), step0 + 1))
    r.wait()
    with pytest.raises(FormulationMismatchError, match="MultiSteps"):
        TrainingRestorer(out_ms, save_steps=1).restore_into(
            S(params, tx_scan.init(params), step0))

    # scan-accum checkpoint -> MultiSteps resume: named error too
    out_sc = str(tmp_path / "sc")
    r2 = TrainingRestorer(out_sc, save_steps=1)
    r2.force_save(1, S(params, tx_scan.init(params), step0 + 1))
    r2.wait()
    with pytest.raises(FormulationMismatchError, match="scan-accum"):
        TrainingRestorer(out_sc, save_steps=1).restore_into(
            S(params, tx_ms.init(params), step0))

    # matching formulations still restore cleanly in both directions
    ok = TrainingRestorer(out_ms, save_steps=1).restore_into(
        S(params, tx_ms.init(params), step0))
    assert int(ok.step) == 1
    ok2 = TrainingRestorer(out_sc, save_steps=1).restore_into(
        S(params, tx_scan.init(params), step0))
    assert int(ok2.step) == 1


def test_lr_mul_mask_prefix():
    mask = lr_mul_mask(_params(), "encoder")
    assert mask["encoder"]["layers_0"]["self_attn"]["qkv"]["kernel"] is True
    assert mask["classifier"]["kernel"] is False


def test_masked_decay_behavior():
    """Bias params don't shrink under adamw weight decay; kernels do."""
    params = {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
    cfg = ConfigDict(dict(optim="adamw", learning_rate=0.0,
                          weight_decay=0.5, num_train_epochs=1,
                          gradient_accumulation_steps=1, grad_norm=-1,
                          decay="constant"))
    # lr=0 -> only weight decay term moves params... adamw couples decay
    # with lr, so use lr>0 and zero grads instead
    cfg.learning_rate = 0.1
    tx = make_optimizer(cfg, total_steps=10, params=params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["bias"] - 1.0).max()) < 1e-7   # no decay
    assert float(new["kernel"][0, 0]) < 1.0                 # decayed


def test_multi_step_schedule():
    sched = get_lr_schedule("multi_step", 1.0, milestones=[10, 20],
                            gamma=0.5)
    assert float(sched(5)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(25)) == 0.25


def test_linear_schedule_warmup_and_decay():
    sched = get_lr_schedule("linear", 1.0, total_steps=100,
                            warmup_ratio=0.1)
    assert float(sched(5)) == pytest.approx(0.5)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(55)) == pytest.approx(0.5)


def test_invsqrt_schedule():
    sched = get_lr_schedule("invsqrt", 1.0, total_steps=100,
                            warmup_ratio=0.1)
    peak = float(sched(10))
    assert peak == pytest.approx(1.0)
    assert float(sched(40)) == pytest.approx(0.5)


def test_lr_mul_applied():
    params = {"vis": {"kernel": jnp.ones((2, 2))},
              "txt": {"kernel": jnp.ones((2, 2))}}
    cfg = ConfigDict(dict(optim="sgd", learning_rate=0.1,
                          num_train_epochs=1,
                          gradient_accumulation_steps=1, grad_norm=-1,
                          decay="constant", transformer_lr_mul=0.5,
                          transformer_lr_mul_prefix="vis"))
    tx = make_optimizer(cfg, total_steps=10, params=params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # vis update scaled by 0.5 relative to txt
    assert float(updates["vis"]["kernel"][0, 0]) == pytest.approx(
        0.5 * float(updates["txt"]["kernel"][0, 0]))
