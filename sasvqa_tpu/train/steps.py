"""jit train/eval steps with mesh data-parallel sharding.

TPU-native core of the training loop (reference hot loop:
src/tasks/run_video_qa.py:474-511):

- bf16 activations replace torch autocast-fp16 + GradScaler (bf16 needs
  no loss scaling on TPU);
- gradient accumulation via optax.MultiSteps replaces the Python-side
  ``(step+1) % accum`` bookkeeping (:495);
- gradient clipping by global norm (cfg.grad_norm);
- one jitted step over the mesh: batch sharded on ``data``, params
  replicated, XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sasvqa_tpu.train.schedules import get_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


_OPTIMIZERS = {
    "adamw": optax.adamw, "adam": optax.adam, "adamax": optax.adamax,
    "sgd": optax.sgd,
}

# parameter-path name fragments that never get weight decay.  The
# reference's no_decay list is exactly ['bias', 'LayerNorm.bias',
# 'LayerNorm.weight'] (optimization/utils.py:124); in flax naming
# LayerNorm.weight is the leaf "scale" and every torch bias is a leaf
# "bias", so ("bias", "scale") is the exact equivalent — embeddings DO
# get weight decay, as in the reference.  (No non-LayerNorm param leaf
# in this repo is named "scale"; CLIP's logit_scale is 0-dim and is
# excluded by the ndim>=2 rule either way.)
NO_DECAY_FRAGMENTS = ("bias", "scale")


def decay_mask(params) -> Any:
    """True where weight decay applies (2D+ kernels outside norms)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decayable(path, leaf):
        names = [str(getattr(k, "key", k)).lower() for k in path]
        if any(frag in name for name in names
               for frag in NO_DECAY_FRAGMENTS):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    paths = {tuple(p): decayable(p, l) for p, l in flat}

    def rebuild(path, leaf):
        return paths[tuple(path)]

    return jax.tree_util.tree_map_with_path(rebuild, params)


def lr_mul_mask(params, prefix: str) -> Any:
    """True for params whose full dotted name CONTAINS ``prefix`` —
    the reference's exact rule is substring containment over the torch
    parameter name (``lr_mul_prefix in n``, optimization/utils.py:63-66),
    so nested modules matching anywhere in the path scale too."""
    def match(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        # flax trees root at 'params'; the reference's names don't
        dotted = ".".join(n for n in names if n != "params")
        return prefix in dotted

    return jax.tree_util.tree_map_with_path(match, params)


def _scale_by_adam_lowp(b1: float, b2: float, eps: float,
                        moment_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in ``moment_dtype``.

    optax's own ``mu_dtype`` covers only the first moment; storing nu
    low-precision too is what halves the moment traffic (the adamw
    update is HBM-bandwidth-bound at the measured 4.95 GB/step floor,
    BASELINE.md).  The EMA update and the mu_hat/nu_hat math run in f32
    — only the *stored* state rounds, a one-per-step 2^-8 relative
    rounding on each moment.  Matches optax.scale_by_adam's formulation
    (bias correction via 1-b^t on the incremented count) so the f32
    instantiation of this transform is step-for-step identical to
    optax's; the shipped f32 path still uses optax.adamw itself.
    """
    md = jnp.dtype(moment_dtype)

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), md)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t

        def one(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return upd.astype(g.dtype), m32.astype(md), v32.astype(md)

        out = jax.tree_util.tree_map(one, updates, state.mu, state.nu)
        upd = jax.tree_util.tree_map(lambda o: o[0], out,
                                     is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg, total_steps: int,
                   params=None) -> optax.GradientTransformation:
    """optax chain: clip -> optimizer(lr schedule) -> MultiSteps(accum).

    Mirrors the live loop's ``getattr(torch.optim, cfg.optim)`` +
    MultiStepLR (run_video_qa.py:416-422).  When ``params`` is given and
    the optimizer is adamw, weight decay is masked off bias/norm/
    embedding params (reference no-decay lists); a
    ``transformer_lr_mul``/``transformer_lr_mul_prefix`` pair scales the
    LR of a named param subtree (reference lr_mul groups).
    """
    name = str(cfg.optim).lower()
    steps_per_epoch = max(total_steps // max(cfg.get("num_train_epochs", 1), 1), 1)
    milestones = [m * steps_per_epoch
                  for m in (cfg.get("step_decay_epochs") or [])]
    sched = get_lr_schedule(
        cfg.get("decay", "constant"), cfg.learning_rate,
        total_steps=total_steps, warmup_ratio=cfg.get("warmup_ratio", 0.1),
        milestones=milestones, gamma=cfg.get("gamma", 0.5))

    opt_name = name if name in _OPTIMIZERS else "adamw"
    kwargs = {}
    if opt_name in ("adam", "adamw", "adamax"):
        betas = cfg.get("betas", [0.9, 0.98])
        kwargs.update(b1=float(betas[0]), b2=float(betas[1]))
    if opt_name == "adamw":
        kwargs.update(weight_decay=cfg.get("weight_decay", 1e-3))
        if params is not None:
            kwargs.update(mask=decay_mask(params))
    moment_dtype = str(cfg.get("adamw_moment_dtype", "f32"))
    if opt_name == "adamw" and moment_dtype == "bf16":
        # opt-in low-precision moments (see _scale_by_adam_lowp); same
        # chain structure as optax.adamw = scale_by_adam ->
        # add_decayed_weights(mask) -> scale_by_learning_rate
        tx = optax.chain(
            _scale_by_adam_lowp(kwargs["b1"], kwargs["b2"], eps=1e-8,
                                moment_dtype=jnp.bfloat16),
            optax.add_decayed_weights(kwargs["weight_decay"],
                                      mask=kwargs.get("mask")),
            optax.scale_by_learning_rate(sched))
    else:
        tx = _OPTIMIZERS[opt_name](learning_rate=sched, **kwargs)

    chain = []
    grad_norm = cfg.get("grad_norm", -1)
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(tx)
    lr_mul = cfg.get("transformer_lr_mul", 1.0)
    prefix = cfg.get("transformer_lr_mul_prefix", "")
    if params is not None and prefix and lr_mul != 1.0:
        mask = lr_mul_mask(params, prefix)
        chain.append(optax.masked(optax.scale(lr_mul), mask))
    out = optax.chain(*chain)
    accum = cfg.get("gradient_accumulation_steps", 1)
    if accum > 1 and not cfg.get("scan_accum", 1):
        # accum_grad_mean=0 reproduces the reference's exact semantics:
        # per-micro loss.backward() with no /K SUMS gradients over the
        # window (run_video_qa.py:490-509 never scales the loss)
        grad_mean = bool(cfg.get("accum_grad_mean", 1))
        # legacy formulation: MultiSteps runs the FULL inner update (and
        # its optimizer memory traffic) every micro step and discards
        # K-1 of K results — measured ~10% step-time waste at msvd_base
        # shape (CLAUDE.md perf notes).  The default path instead
        # accumulates in-jit via make_scan_train_step and the chain
        # stays unwrapped.
        out = optax.MultiSteps(out, every_k_schedule=accum,
                               use_grad_mean=grad_mean)
    return out


def lr_at(cfg, total_steps: int, global_step: int) -> float:
    """Host-side lr actually applied by the update that produced
    ``global_step`` (1-based) — zero device ops, for train/lr logging.

    optax's scale_by_learning_rate evaluates the schedule at its
    internal update-call count (pre-increment, so the first update sees
    count 0).  Both formulations advance that count once per global
    step: scan-accum calls update() once per window, and MultiSteps
    only COMMITS its inner state at window boundaries (measured:
    inner count == gradient_step at every micro).  Milestone units
    follow make_optimizer exactly."""
    from sasvqa_tpu.train.schedules import lr_value
    steps_per_epoch = max(
        total_steps // max(cfg.get("num_train_epochs", 1), 1), 1)
    milestones = [m * steps_per_epoch
                  for m in (cfg.get("step_decay_epochs") or [])]
    count = int(global_step) - 1
    return lr_value(cfg.get("decay", "constant"), cfg.learning_rate,
                    max(count, 0), total_steps=total_steps,
                    warmup_ratio=cfg.get("warmup_ratio", 0.1),
                    milestones=milestones, gamma=cfg.get("gamma", 0.5))


def create_train_state(model, params, cfg, total_steps: int) -> TrainState:
    tx = make_optimizer(cfg, total_steps, params=params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=model.apply)


# --------------------------------------------------------------------------
# steps


def make_classifier_train_step(mesh: Optional[Mesh] = None):
    """Train step for CLIP/BLIP classification models.

    Returns fn(state, batch, rng) -> (state, metrics) with metrics
    {loss, acc_correct, acc_total} (train accuracy meter parity with
    run_video_qa.py:483-486).
    """

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = state.apply_fn(
                params, batch["text_input_ids"],
                batch["text_attention_mask"], batch["visual_inputs"],
                labels=batch["labels"], deterministic=False,
                rngs={"dropout": rng})
            return out["loss"], out["logits"]

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads)
        preds = jnp.argmax(logits, axis=-1)
        valid = batch["labels"] != -100
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "acc_correct": ((preds == batch["labels"]) & valid).sum(),
            "acc_total": valid.sum(),
        }
        return state, metrics

    return _maybe_jit_sharded(step, mesh)


def make_git_train_step(mesh: Optional[Mesh] = None):
    """Train step for the GIT generative model (loss from LM labels)."""

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = state.apply_fn(
                params, batch["text_input_ids"],
                batch["text_attention_mask"], batch["visual_inputs"],
                labels=batch["labels"], deterministic=False,
                rngs={"dropout": rng})
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "grad_norm": gnorm}

    return _maybe_jit_sharded(step, mesh)


def make_scan_train_step(k_micro: int, family: str = "classifier",
                         n_options: int = 0,
                         mesh: Optional[Mesh] = None,
                         grad_mean: bool = True):
    """One jitted call = ONE optimizer update over ``k_micro`` stacked
    micro-batches (leading axis K on every batch leaf: (K, B, ...)).

    Gradients accumulate in-jit via ``lax.scan`` with the exact Welford
    running mean optax.MultiSteps uses (``acc + (g - acc)/(n+1)``), but
    the optimizer chain — and its full moment-memory traffic — runs once
    per K micros instead of every micro.  MultiSteps pays the whole
    inner update each micro and discards K-1 of K results: measured
    ~10% step-time waste at msvd_base shape (67.4 vs 61.4 ms/micro,
    CLAUDE.md perf notes); the reference's configs accumulate 8-128
    micros (configs/msvd_qa_base2.json "gradient_accumulation_steps").

    Alignment contract with the MultiSteps path (tested in
    tests/test_scan_accum.py):
    - ``state.step`` keeps counting MICRO steps (advances by K per
      call), so per-micro dropout rng folding, restorer save cadence
      and resume micro-alignment are unchanged;
    - the LR-schedule count (inner chain update count) advances once
      per global step in both formulations;
    - param trajectories match MultiSteps to float tolerance.
    Divergence: ``grad_norm`` reports the norm of the ACCUMULATED mean
    gradient (the quantity actually clipped/applied) rather than the
    boundary micro's raw gradient; ``loss`` is the mean over the K
    micros rather than the boundary micro's.

    ``grad_mean=False`` SUMS micro-gradients instead — the reference's
    exact live semantics (its per-micro ``loss.backward()`` never
    divides by K, run_video_qa.py:490-509); pair with
    ``--accum_grad_mean 0``'s MultiSteps(use_grad_mean=False) fallback.
    """
    assert k_micro >= 1
    assert family in ("classifier", "git", "mc")

    def forward_metrics(params, apply_fn, mb, rng):
        if family == "git":
            out = apply_fn(params, mb["text_input_ids"],
                           mb["text_attention_mask"], mb["visual_inputs"],
                           labels=mb["labels"], deterministic=False,
                           rngs={"dropout": rng})
            return out["loss"], {}
        if family == "mc":
            out = apply_fn(params, mb["text_input_ids"],
                           mb["text_attention_mask"], mb["visual_inputs"],
                           n_options, labels=mb["labels"],
                           deterministic=False, rngs={"dropout": rng},
                           method="multiple_choice")
            preds = jnp.argmax(out["logits"], axis=-1)
            return out["loss"], {
                "acc_correct": (preds == mb["labels"]).sum(),
                "acc_total": jnp.asarray(preds.shape[0])}
        out = apply_fn(params, mb["text_input_ids"],
                       mb["text_attention_mask"], mb["visual_inputs"],
                       labels=mb["labels"], deterministic=False,
                       rngs={"dropout": rng})
        preds = jnp.argmax(out["logits"], axis=-1)
        valid = mb["labels"] != -100
        return out["loss"], {
            "acc_correct": ((preds == mb["labels"]) & valid).sum(),
            "acc_total": valid.sum()}

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple:
        def loss_fn(params, mb, r):
            return forward_metrics(params, state.apply_fn, mb, r)

        def micro(acc, xs):
            mb, i = xs
            # same per-micro rng stream as the MultiSteps path, where
            # state.step itself advances every micro
            r = jax.random.fold_in(rng, state.step + i)
            (loss, m), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, mb, r)
            if grad_mean:
                acc = jax.tree_util.tree_map(
                    lambda g, a: a + (g - a) / (i + 1).astype(g.dtype),
                    grads, acc)
            else:
                acc = jax.tree_util.tree_map(jnp.add, grads, acc)
            m = dict(m, loss=loss)
            return acc, m

        acc0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        acc_grads, ys = jax.lax.scan(
            micro, acc0, (batch, jnp.arange(k_micro, dtype=jnp.int32)))
        updates, new_opt = state.tx.update(acc_grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + k_micro,
                              params=new_params, opt_state=new_opt)
        metrics = {"loss": ys["loss"].mean(),
                   "grad_norm": optax.global_norm(acc_grads)}
        if "acc_correct" in ys:
            metrics["acc_correct"] = ys["acc_correct"].sum()
            metrics["acc_total"] = ys["acc_total"].sum()
        return state, metrics

    return _maybe_jit_sharded(step, mesh, micro_axis=True)


def make_mc_train_step(n_options: int, mesh: Optional[Mesh] = None):
    """Train step for TGIF-QA action/transition multiple choice:
    logits (B, n_options), labels (B,) option indices."""

    def step(state: TrainState, batch: Dict[str, Any], rng) -> Tuple:
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = state.apply_fn(
                params, batch["text_input_ids"],
                batch["text_attention_mask"], batch["visual_inputs"],
                n_options, labels=batch["labels"], deterministic=False,
                rngs={"dropout": rng}, method="multiple_choice")
            return out["loss"], out["logits"]

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        preds = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "acc_correct": (preds == batch["labels"]).sum(),
            "acc_total": jnp.asarray(preds.shape[0]),
        }
        return state, metrics

    return _maybe_jit_sharded(step, mesh)


def make_mc_eval_step(n_options: int, mesh: Optional[Mesh] = None):
    def step(state: TrainState, batch: Dict[str, Any]):
        out = state.apply_fn(
            state.params, batch["text_input_ids"],
            batch["text_attention_mask"], batch["visual_inputs"],
            n_options, method="multiple_choice")
        return jnp.argmax(out["logits"], axis=-1), jnp.zeros(())

    return _maybe_jit_sharded(step, mesh, donate=False)


def make_classifier_logits_step(mesh: Optional[Mesh] = None):
    """Eval step returning raw logits (multi-clip ensemble aggregation
    happens outside: mean/max/lse over clip samples, the reference's
    score_agg_func surface, configs/config.py:99-101)."""

    def step(state: TrainState, batch: Dict[str, Any]):
        out = state.apply_fn(
            state.params, batch["text_input_ids"],
            batch["text_attention_mask"], batch["visual_inputs"])
        return out["logits"]

    return _maybe_jit_sharded(step, mesh, donate=False)


def make_classifier_eval_step(mesh: Optional[Mesh] = None):
    def step(state: TrainState, batch: Dict[str, Any]):
        out = state.apply_fn(
            state.params, batch["text_input_ids"],
            batch["text_attention_mask"], batch["visual_inputs"],
            labels=batch.get("labels"))
        preds = jnp.argmax(out["logits"], axis=-1)
        return preds, out.get("loss", jnp.zeros(()))

    return _maybe_jit_sharded(step, mesh, donate=False)


def make_git_eval_step(model, max_text_len: int = 50,
                       max_new_tokens: Optional[int] = None,
                       mesh: Optional[Mesh] = None):
    """Generative eval: greedy decode -> (B, max_new) token ids.
    max_new_tokens=None decodes to the full max_text_len budget (the
    reference's generate(max_length=50)-total semantics) with all-done
    early exit inside greedy_generate."""
    from sasvqa_tpu.models.git import greedy_generate

    def step(state: TrainState, batch: Dict[str, Any]):
        return greedy_generate(
            model, state.params, batch["text_input_ids"],
            batch["prompt_len"], batch["visual_inputs"],
            max_text_len=max_text_len, max_new_tokens=max_new_tokens)

    return _maybe_jit_sharded(step, mesh, donate=False)


def _maybe_jit_sharded(fn, mesh: Optional[Mesh], donate: bool = True,
                       micro_axis: bool = False):
    """jit with batch-on-data sharding constraints when a mesh is given.

    ``micro_axis``: batch leaves carry a leading (K,) micro axis (scan
    accumulation) — the data axis is dim 1, so constrain P(None, 'data')
    and leave the micro axis whole on every device."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
    spec = P(None, "data") if micro_axis else P("data")
    min_ndim = 2 if micro_axis else 1

    def wrapped(state, batch, *rest):
        sharded = NamedSharding(mesh, spec)
        batch = {k: jax.lax.with_sharding_constraint(v, sharded)
                 if hasattr(v, "ndim") and v.ndim >= min_ndim else v
                 for k, v in batch.items()}
        return fn(state, batch, *rest)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())
