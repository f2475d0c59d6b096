"""Mesh / data-parallel sharding on the 8-virtual-CPU-device harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sasvqa_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      pad_batch_to_multiple, shard_batch)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(devices=jax.devices("cpu"))


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_data_axis(mesh):
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
             "qids": [1, 2, 3]}
    out = shard_batch(batch, mesh)
    sh = out["x"].sharding
    assert sh.spec == P("data")
    assert out["qids"] == [1, 2, 3]


def test_psum_equivalence_data_parallel(mesh):
    """Grad of a sharded-batch loss == grad of the unsharded loss."""
    w = jnp.ones((4,)) * 0.5
    x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-6)


def test_pad_batch_to_multiple():
    batch = {"x": np.ones((5, 2)), "labels": np.array([1, 2, 3, 4, 5]),
             "question_ids": [1] * 5}
    out = pad_batch_to_multiple(batch, 8)
    assert out["x"].shape == (8, 2)
    assert out["labels"].shape == (8,)
    assert (out["labels"][5:] == -100).all()
    assert out["question_ids"] == [1] * 5


def _tiny_state(total_steps=10, optim="adamw"):
    from sasvqa_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    from sasvqa_tpu.models.video_qa import CLIPVideoQA, ClassifierHeadConfig
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.train import steps as ts

    tc = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                        num_layers=1, num_heads=2,
                        max_position_embeddings=8, eos_token_id=63)
    vc = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                          num_heads=2, image_size=16, patch_size=8,
                          projection_dim=16)
    model = CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=5))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 63, size=(8, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    px = jnp.asarray(rng.normal(size=(8, 2, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=(8,)), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px)
    cfg = ConfigDict(dict(optim=optim, learning_rate=1e-3,
                          num_train_epochs=1, gradient_accumulation_steps=1,
                          grad_norm=1.0))
    state = ts.create_train_state(model, params, cfg,
                                  total_steps=total_steps)
    batch = {"text_input_ids": ids, "text_attention_mask": mask,
             "visual_inputs": px, "labels": labels}
    return ts, state, batch


def test_fsdp_step_matches_replicated():
    """A train step with params sharded on the fsdp axis produces the
    same loss and updated params as the replicated run (ZeRO-3-style
    sharding is a layout choice, not a numerics choice).  SGD isolates
    the layout comparison: Adam's g/|g| normalization would amplify
    reduction-order noise on near-zero gradients into sign flips."""
    from sasvqa_tpu.parallel.mesh import fsdp_param_sharding

    ts, state_a, batch = _tiny_state(optim="sgd")
    step_plain = ts.make_classifier_train_step(mesh=None)
    new_a, m_a = step_plain(state_a, dict(batch), jax.random.key(1))
    ref_params = jax.device_get(new_a.params)
    ref_loss = float(m_a["loss"])

    fmesh = make_mesh(devices=jax.devices("cpu"), shape=(4, 2),
                      axes=("data", "fsdp"))
    ts, state_b, batch = _tiny_state(optim="sgd")
    p_shard = fsdp_param_sharding(state_b.params, fmesh, min_size=64)
    specs = {s.spec for s in jax.tree_util.tree_leaves(p_shard)}
    assert any(s != P() for s in specs), "no param actually sharded"
    sharded_params = jax.tree_util.tree_map(jax.device_put,
                                            state_b.params, p_shard)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(fmesh, P())),
        state_b.opt_state)
    state_b = state_b.replace(params=sharded_params, opt_state=opt_state)
    step_fsdp = ts.make_classifier_train_step(fmesh)
    new_b, m_b = step_fsdp(state_b, shard_batch(batch, fmesh),
                           jax.random.key(1))
    assert float(m_b["loss"]) == pytest.approx(ref_loss, rel=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(ref_params),
                      jax.tree_util.tree_leaves(jax.device_get(new_b.params))):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=2e-6, atol=2e-7)


def test_tp_classifier_matches_replicated():
    """Megatron-style TP (heads/MLP-hidden over 'model') is a layout
    choice: a (data=4, model=2) step must reproduce the replicated
    loss/params.  SGD for the same reason as the fsdp test."""
    from sasvqa_tpu.parallel.tp import count_sharded, tp_param_sharding

    ts, state_a, batch = _tiny_state(optim="sgd")
    step_plain = ts.make_classifier_train_step(mesh=None)
    new_a, m_a = step_plain(state_a, dict(batch), jax.random.key(1))
    ref_params = jax.device_get(new_a.params)
    ref_loss = float(m_a["loss"])

    tmesh = make_mesh(devices=jax.devices("cpu"), shape=(4, 2),
                      axes=("data", "model"))
    ts, state_b, batch = _tiny_state(optim="sgd")
    p_shard = tp_param_sharding(state_b.params, tmesh)
    assert count_sharded(p_shard) >= 8, "TP sharded too few params"
    state_b = state_b.replace(
        params=jax.tree_util.tree_map(jax.device_put, state_b.params,
                                      p_shard),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(tmesh, P())),
            state_b.opt_state))
    step_tp = ts.make_classifier_train_step(tmesh)
    new_b, m_b = step_tp(state_b, shard_batch(batch, tmesh),
                         jax.random.key(1))
    assert float(m_b["loss"]) == pytest.approx(ref_loss, rel=1e-6)
    for pa, pb in zip(jax.tree_util.tree_leaves(ref_params),
                      jax.tree_util.tree_leaves(jax.device_get(new_b.params))):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                                   rtol=2e-6, atol=2e-7)


def test_tp_rules_classify_git_params():
    """The path rules pick up every projection family: GIT fused qkv
    (column), out_dense (row), ffn intermediate/output (column/row),
    LM head (column over vocab), and leave LN/embeddings replicated."""
    import jax.numpy as jnp
    from sasvqa_tpu.models.clip import CLIPVisionConfig
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM
    from sasvqa_tpu.parallel.tp import tp_param_sharding

    cfg = GITConfig(vocab_size=64, hidden_size=16, num_layers=1,
                    num_heads=2, intermediate_size=32,
                    max_position_embeddings=32,
                    vision=CLIPVisionConfig(hidden_size=16,
                                            intermediate_size=32,
                                            num_layers=1, num_heads=2,
                                            image_size=16, patch_size=8))
    model = GITForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 63, size=(2, 4)), jnp.int32)
    px = jnp.asarray(rng.normal(size=(2, 1, 16, 16, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), ids,
                                 jnp.ones_like(ids), px)
    tmesh = make_mesh(devices=jax.devices("cpu"), shape=(4, 2),
                      axes=("data", "model"))
    shard = tp_param_sharding(params, tmesh)
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(shard)[0]}

    def spec_of(suffix):
        hits = [v for k, v in flat.items() if k.endswith(suffix)]
        assert hits, f"no param path ends with {suffix}"
        return hits[0]

    assert spec_of("attention/qkv/kernel") == P(None, "model")
    assert spec_of("attention/out_dense/kernel") == P("model", None)
    assert spec_of("ffn/intermediate/kernel") == P(None, "model")
    assert spec_of("ffn/output/kernel") == P("model", None)
    assert spec_of("ffn/output/bias") == P()          # added post-psum
    # LM head: top-level "output" is column-parallel over vocab
    lm = [v for k, v in flat.items()
          if k.endswith("output/kernel") and "ffn" not in k]
    assert lm and lm[0] == P(None, "model")
    assert spec_of("out_ln/scale") == P()
    # vision tower fused projections shard too
    assert spec_of("self_attn/qkv/kernel") == P(None, "model")
    assert spec_of("mlp/fc1/kernel") == P(None, "model")
    assert spec_of("mlp/fc2/kernel") == P("model", None)


def test_tp_fsdp_3d_git_step():
    """Full 3D mesh (data=2, fsdp=2, model=2): GIT train step compiles,
    runs, and produces a finite loss with params sharded on BOTH the
    model and fsdp axes."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec
    from sasvqa_tpu.models.clip import CLIPVisionConfig
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM
    from sasvqa_tpu.parallel.tp import tp_param_sharding

    cfg = GITConfig(vocab_size=64, hidden_size=16, num_layers=1,
                    num_heads=2, intermediate_size=32,
                    max_position_embeddings=32,
                    vision=CLIPVisionConfig(hidden_size=16,
                                            intermediate_size=32,
                                            num_layers=1, num_heads=2,
                                            image_size=16, patch_size=8))
    model = GITForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 63, size=(4, 4)), jnp.int32)
    mask = jnp.ones_like(ids)
    px = jnp.asarray(rng.normal(size=(4, 1, 16, 16, 3)), jnp.float32)
    labels = jnp.where(mask == 1, ids, -100)
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px)

    m3 = make_mesh(devices=jax.devices("cpu"), shape=(2, 2, 2),
                   axes=("data", "fsdp", "model"))
    p_shard = tp_param_sharding(params, m3, fsdp_axis="fsdp", min_size=256)
    specs = {s.spec for s in jax.tree_util.tree_leaves(p_shard)}
    assert any("model" in str(s) for s in specs)
    assert any("fsdp" in str(s) for s in specs)
    params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
    tx = optax.sgd(1e-3)
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(m3, PartitionSpec())),
        tx.init(params))
    data = NamedSharding(m3, PartitionSpec("data"))
    ids, mask, px, labels = (jax.device_put(x, data)
                             for x in (ids, mask, px, labels))

    @jax.jit
    def step(params, opt_state, ids, mask, px, labels):
        def loss_fn(p):
            return model.apply(p, ids, mask, px, labels=labels)["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, ids, mask, px, labels)
    assert np.isfinite(float(loss))


def test_restore_into_tp_sharded_state(tmp_path):
    """Preemption restore with TP/FSDP-sharded params: Orbax restores
    onto the template's NamedShardings, so a resumed run keeps the same
    layout (and values) it saved with."""
    from jax.sharding import PartitionSpec
    from sasvqa_tpu.core.checkpoint import TrainingRestorer
    from sasvqa_tpu.parallel.tp import tp_param_sharding

    ts, state, _ = _tiny_state(optim="sgd")
    tmesh = make_mesh(devices=jax.devices("cpu"), shape=(4, 2),
                      axes=("data", "model"))
    p_shard = tp_param_sharding(state.params, tmesh)
    # perturb saved params so they differ from a fresh (same-seed) init:
    # the value assert below must be able to catch a restore that
    # silently keeps the input tree
    state = state.replace(
        params=jax.device_put(
            jax.tree_util.tree_map(lambda x: x + 0.25, state.params),
            p_shard),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(tmesh, PartitionSpec())),
            state.opt_state),
        step=state.step + 5)

    out = str(tmp_path / "tp_resume")
    r1 = TrainingRestorer(out, save_steps=1)
    r1.maybe_save(5, state)
    r1.wait()

    ts2, state2, _ = _tiny_state(optim="sgd")
    state2 = state2.replace(params=jax.device_put(state2.params, p_shard))
    state2 = TrainingRestorer(out, save_steps=1).restore_into(state2)
    assert int(state2.step) == 5
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        assert b.sharding == a.sharding           # layout preserved
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_on_mesh(mesh):
    """Tiny classifier train step sharded over the mesh runs and the
    params stay replicated."""
    from sasvqa_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    from sasvqa_tpu.models.video_qa import CLIPVideoQA, ClassifierHeadConfig
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.train import steps as ts

    tc = CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                        num_layers=1, num_heads=2,
                        max_position_embeddings=8, eos_token_id=63)
    vc = CLIPVisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                          num_heads=2, image_size=16, patch_size=8,
                          projection_dim=16)
    model = CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=5))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 63, size=(8, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    px = jnp.asarray(rng.normal(size=(8, 2, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=(8,)), jnp.int32)

    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px)
    cfg = ConfigDict(dict(optim="adamw", learning_rate=1e-3,
                          num_train_epochs=1, gradient_accumulation_steps=1,
                          grad_norm=1.0))
    state = ts.create_train_state(model, params, cfg, total_steps=10)

    step = ts.make_classifier_train_step(mesh)
    batch = shard_batch({"text_input_ids": ids,
                         "text_attention_mask": mask,
                         "visual_inputs": px, "labels": labels}, mesh)
    state2, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
