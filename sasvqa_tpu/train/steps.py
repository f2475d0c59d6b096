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
    if accum > 1:
        out = optax.MultiSteps(out, every_k_schedule=accum)
    return out


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


def _maybe_jit_sharded(fn, mesh: Optional[Mesh], donate: bool = True):
    """jit with batch-on-data sharding constraints when a mesh is given."""
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,) if donate else ())
    replicated = NamedSharding(mesh, P())

    def wrapped(state, batch, *rest):
        sharded = NamedSharding(mesh, P("data"))
        batch = {k: jax.lax.with_sharding_constraint(v, sharded)
                 if hasattr(v, "ndim") and v.ndim >= 1 else v
                 for k, v in batch.items()}
        return fn(state, batch, *rest)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())
