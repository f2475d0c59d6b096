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


def test_decay_mask_excludes_bias_norm_embeddings():
    mask = decay_mask(_params())
    assert mask["classifier"]["kernel"] is True
    assert mask["classifier"]["bias"] is False
    enc = mask["encoder"]
    assert enc["layers_0"]["self_attn"]["qkv"]["kernel"] is True
    assert enc["layers_0"]["self_attn"]["qkv"]["bias"] is False
    assert enc["layers_0"]["layer_norm1"]["scale"] is False
    assert enc["token_embedding"]["embedding"] is False


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
