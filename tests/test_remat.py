"""Remat transparency: nn.remat (with or without a checkpoint policy)
must not change forward values or gradients — it only trades recompute
for activation memory (used by the ViT-L many-frame configs,
BASELINE.md vitl16; reference has no equivalent, its torch path simply
OOMs or fits)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sasvqa_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder

TINY = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
    image_size=16, patch_size=8)


def _grads(remat, remat_policy=None):
    enc = CLIPVisionEncoder(TINY, dtype=jnp.float32, remat=remat,
                            remat_policy=remat_policy)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    params = jax.jit(enc.init)(jax.random.key(0), pixels)

    @jax.jit
    def loss_and_grad(p):
        def f(p):
            _, pooled, _ = enc.apply(p, pixels)
            return (pooled.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(f)(p)

    return loss_and_grad(params)


@pytest.mark.parametrize("policy", [None, "dots_saveable",
                                    "dots_with_no_batch_dims_saveable"])
def test_remat_matches_no_remat(policy):
    base_loss, base_grads = _grads(remat=False)
    loss, grads = _grads(remat=True, remat_policy=policy)
    np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        grads, base_grads)


def test_build_model_propagates_remat_policy():
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.models.presets import build_model
    cfg = ConfigDict({"model": {"pretrained_model": "tiny-git",
                                "vocab_size": 64, "remat": True,
                                "remat_policy": "dots_saveable"}})
    family, model = build_model(cfg)
    assert family == "git"
    assert model.remat is True
    assert model.remat_policy == "dots_saveable"
    # empty-string / absent policy normalizes to None (full recompute)
    cfg2 = ConfigDict({"model": {"pretrained_model": "tiny-git",
                                 "vocab_size": 64, "remat": True,
                                 "remat_policy": ""}})
    _, model2 = build_model(cfg2)
    assert model2.remat_policy is None


def test_unknown_remat_policy_fails_loudly():
    enc = CLIPVisionEncoder(TINY, remat=True, remat_policy="not_a_policy")
    pixels = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(AttributeError):
        jax.eval_shape(lambda: enc.init(jax.random.key(0), pixels))
