"""Scan gradient accumulation vs optax.MultiSteps (VERDICT r2 #1).

make_scan_train_step accumulates K micro-grads in-jit (Welford running
mean, identical to MultiSteps' accumulator) and applies ONE optimizer
update per global step; these tests pin the alignment contract:
identical param trajectories, identical micro-step counters (resume
alignment), identical per-micro dropout rng streams.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from sasvqa_tpu.core.config import ConfigDict
from sasvqa_tpu.data.pipeline import stack_microbatches
from sasvqa_tpu.train import steps as ts


def _copy(params):
    # train steps donate the state, so every path needs its own buffers
    return jax.tree_util.tree_map(lambda x: jnp.array(x), params)


class _TinyClassifier(nn.Module):
    """Minimal model with the classifier apply signature (incl. dropout,
    so rng-stream alignment between the two paths is actually tested)."""
    num_labels: int = 5

    @nn.compact
    def __call__(self, text_input_ids, text_attention_mask, visual_inputs,
                 labels=None, deterministic=True, rngs=None):
        txt = nn.Embed(32, 8)(text_input_ids).mean(axis=1)
        vis = nn.Dense(8)(visual_inputs.reshape(visual_inputs.shape[0], -1))
        h = nn.Dense(16)(jnp.concatenate([txt, vis], axis=-1))
        h = nn.Dropout(0.5, deterministic=deterministic)(nn.relu(h))
        logits = nn.Dense(self.num_labels)(h)
        out = {"logits": logits}
        if labels is not None:
            valid = labels != -100
            safe = jnp.where(valid, labels, 0)
            ce = -jax.nn.log_softmax(logits)[jnp.arange(len(safe)), safe]
            out["loss"] = jnp.where(valid, ce, 0.0).sum() / \
                jnp.maximum(valid.sum(), 1)
        return out


def _cfg(accum, scan):
    return ConfigDict(optim="adamw", learning_rate=1e-3, decay="constant",
                      weight_decay=0.01, grad_norm=1.0,
                      num_train_epochs=1,
                      gradient_accumulation_steps=accum, scan_accum=scan,
                      betas=[0.9, 0.98])


def _micro_batches(n, b=4, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "text_input_ids": rng.integers(0, 32, (b, 6)).astype(np.int32),
            "text_attention_mask": np.ones((b, 6), np.int32),
            "visual_inputs": rng.normal(size=(b, 3)).astype(np.float32),
            "labels": rng.integers(0, 5, (b,)).astype(np.int32),
        })
    return out


@pytest.fixture(scope="module")
def setup():
    model = _TinyClassifier()
    micros = _micro_batches(6)
    key = jax.random.key(7)
    params = model.init(key, jnp.asarray(micros[0]["text_input_ids"]),
                        jnp.asarray(micros[0]["text_attention_mask"]),
                        jnp.asarray(micros[0]["visual_inputs"]))
    return model, params, micros, key


def test_scan_matches_multisteps_trajectory(setup):
    """2 global steps x K=3 micros: identical params + micro counter."""
    model, params, micros, key = setup
    K = 3

    ms_state = ts.create_train_state(model, _copy(params), _cfg(K, scan=0),
                                     total_steps=10)
    ms_step = ts.make_classifier_train_step()
    for mb in micros:
        ms_state, ms_metrics = ms_step(ms_state, mb, key)

    sc_state = ts.create_train_state(model, _copy(params), _cfg(K, scan=1),
                                     total_steps=10)
    sc_step = ts.make_scan_train_step(K, "classifier")
    stacked = list(stack_microbatches(iter(micros), K))
    assert len(stacked) == 2
    for sb in stacked:
        sc_state, sc_metrics = sc_step(sc_state, sb, key)

    assert int(ms_state.step) == int(sc_state.step) == 6
    flat_ms = jax.tree_util.tree_leaves(ms_state.params)
    flat_sc = jax.tree_util.tree_leaves(sc_state.params)
    for a, b in zip(flat_ms, flat_sc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)


def test_scan_metrics_semantics(setup):
    """loss = mean over K micros; acc counters = sums over K micros;
    grad_norm finite (norm of the accumulated mean gradient)."""
    model, params, micros, key = setup
    K = 3
    sc_state = ts.create_train_state(model, _copy(params), _cfg(K, scan=1),
                                     total_steps=10)
    sc_step = ts.make_scan_train_step(K, "classifier")
    sb = next(stack_microbatches(iter(micros), K))
    _, m = sc_step(sc_state, sb, key)

    # per-micro reference losses on the SAME params/rng stream
    per_micro = []
    for i, mb in enumerate(micros[:K]):
        r = jax.random.fold_in(key, i)
        out = model.apply(params, jnp.asarray(mb["text_input_ids"]),
                          jnp.asarray(mb["text_attention_mask"]),
                          jnp.asarray(mb["visual_inputs"]),
                          labels=jnp.asarray(mb["labels"]),
                          deterministic=False, rngs={"dropout": r})
        per_micro.append(float(out["loss"]))
    np.testing.assert_allclose(float(m["loss"]), np.mean(per_micro),
                               rtol=1e-5)
    assert int(m["acc_total"]) == K * 4
    assert np.isfinite(float(m["grad_norm"]))


def test_stack_microbatches_shapes_and_host_keys():
    micros = _micro_batches(5, b=2)
    for mb in micros:
        mb["question_ids"] = [f"q{id(mb)}a", f"q{id(mb)}b"]
        mb["caption_ids"] = None
    stacked = list(stack_microbatches(iter(micros), 2))
    # 5 micros / K=2 -> 2 full windows, trailing partial dropped
    assert len(stacked) == 2
    sb = stacked[0]
    assert sb["text_input_ids"].shape == (2, 2, 6)
    assert sb["visual_inputs"].shape == (2, 2, 3)
    assert isinstance(sb["question_ids"], list) \
        and len(sb["question_ids"]) == 2
    assert sb["caption_ids"] is None


def test_stack_microbatches_rejects_ragged():
    a, b = _micro_batches(2, b=2)
    b["text_input_ids"] = b["text_input_ids"][:, :4]  # different bucket
    with pytest.raises(AssertionError, match="shapes differ"):
        list(stack_microbatches(iter([a, b]), 2))


def test_scan_step_sharded_on_mesh(setup):
    """K-stacked batch on a 4-device data mesh: P(None, 'data') leaves,
    finite loss, params advance."""
    from jax.sharding import Mesh
    model, params, micros, key = setup
    K = 2
    devs = np.array(jax.devices("cpu")[:4])
    mesh = Mesh(devs, ("data",))
    sc_state = ts.create_train_state(model, _copy(params), _cfg(K, scan=1),
                                     total_steps=10)
    sc_step = ts.make_scan_train_step(K, "classifier", mesh=mesh)
    sb = next(stack_microbatches(iter(micros), K))
    from sasvqa_tpu.parallel.mesh import shard_batch
    sb = shard_batch(sb, mesh, micro_axis=True)
    new_state, m = sc_step(sc_state, sb, key)
    assert np.isfinite(float(m["loss"]))
    assert int(new_state.step) == K
