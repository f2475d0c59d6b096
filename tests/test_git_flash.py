"""GIT-specialized flash kernel vs the dense-bias XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sasvqa_tpu.models.git import git_attention_bias
from sasvqa_tpu.ops import git_flash as gf


@pytest.fixture(autouse=True)
def interpret_mode():
    gf.set_interpret_mode(True)
    yield
    gf.set_interpret_mode(False)


def _xla_ref(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("num_img,l", [(128, 24), (197, 30), (64, 64)])
def test_matches_dense_mask(num_img, l):
    b, h, d = 2, 2, 64
    s = num_img + l
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = np.ones((b, l), np.int32)
    mask[0, -5:] = 0   # padding on example 0
    mask = jnp.asarray(mask)

    out = gf.git_flash_attention(q, k, v, mask, num_img)
    ref = _xla_ref(q, k, v, git_attention_bias(num_img, mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_mask_free_prefix_paths():
    """num_img spanning multiple key blocks exercises the static split
    paths (fwd/dQ unmasked-prefix loops AND the two-call dK/dV split):
    with num_img=640 and 128-blocks, n_free = 5 of the key blocks run
    the mask-free bodies.  Every production config hits these paths
    (num_img=1576, bk=896 -> n_free=1) but the default test shapes
    (num_img < 512) never did."""
    b, h, num_img, l, d = 1, 2, 640, 64, 64
    s = num_img + l
    rng = np.random.default_rng(7)
    qf, kf, vf = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
                  for _ in range(3))
    mask = np.ones((b, l), np.int32)
    mask[0, -9:] = 0
    mask = jnp.asarray(mask)
    bias = git_attention_bias(num_img, mask)

    out = gf.git_flash_attention(qf, kf, vf, mask, num_img,
                                 block_q=128, block_k=128)
    ref = _xla_ref(qf, kf, vf, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)

    def loss_flash(q, k, v):
        o = gf.git_flash_attention(q, k, v, mask, num_img, 128, 128)
        return (o.astype(jnp.float32) ** 2).mean()

    def loss_ref(q, k, v):
        return (_xla_ref(q, k, v, bias).astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(qf, kf, vf)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, rtol=1e-4)


def test_non_dividing_block_pair_covers_all_rows():
    """Regression: explicit (bq, bk) whose lcm exceeds max(bq, bk) — a
    max()-based pad used to leave the tail query rows unwritten; padding
    must go to the lcm so every row is computed."""
    b, h, num_img, l, d = 1, 2, 128, 24, 64   # s=152; lcm(128,192)=384
    s = num_img + l
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.ones((b, l), np.int32))
    out = gf.git_flash_attention(q, k, v, mask, num_img,
                                 block_q=128, block_k=192)
    ref = _xla_ref(q, k, v, git_attention_bias(num_img, mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    # partial override resolves square (no mixed user/chosen pairs)
    out2 = gf.git_flash_attention(q, k, v, mask, num_img, block_q=128)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_choose_blocks_minimises_weighted_cost():
    """Shape-aware block chooser: minimise padded S^2 work weighted by
    the split-backward penalty where the fused kernel cannot compile,
    prefer big tiles on ties.  S=1608 (8-frame GIT-base) must pick
    896x896 (pad 1792, vs 2048 for the 512x1024 default); S=4096 fits
    512x1024 exactly (split, but 27% less padding than any fused
    option); S=4144 (16-frame ViT-L) picks 512x512 — the only
    fused-eligible tile at that length, measured faster than the
    padding-optimal split 896^2 (33.6 vs 35.0 ms)."""
    import math
    assert gf._choose_blocks(1608) == (896, 896)   # pad 1792 (not 2048)
    # 4096 fits BOTH 512x1024 and 512x512 exactly; only 512x512 keeps
    # the fused backward (the 512x1024 row cap is 3072) -> fused wins
    assert gf._choose_blocks(4096) == (512, 512)
    assert gf._choose_blocks(2048) == (512, 1024)  # exact fit AND fused
    assert gf._choose_blocks(4144) == (512, 512)   # fused beats padding
    # chosen cost is optimal over the candidate set for any S
    for s in (197, 1608, 2000, 4144, 8192):
        bq, bk = gf._choose_blocks(s)
        l = math.lcm(bq, bk)
        pad = -(-s // l) * l
        cost = pad * pad * (1.0 if gf._fused_eligible(pad, 64, bq, bk)
                            else gf._SPLIT_BWD_PENALTY)
        for cq, ck in gf._BLOCK_CANDIDATES:
            cl = math.lcm(cq, ck)
            cpad = -(-s // cl) * cl
            ccost = cpad * cpad * (
                1.0 if gf._fused_eligible(cpad, 64, cq, ck)
                else gf._SPLIT_BWD_PENALTY)
            assert cost <= ccost


def test_fused_bwd_vmem_guard_routing():
    """The fused single-pass backward must route to the split kernels on
    shapes whose scoped-VMEM footprint exceeds the v5e's 16 MiB limit.
    Calibration points are measured compile probes (r3, 896x896 blocks,
    realistic b*h grids): s_pad 1792 (flagship) and 2688 compile fused;
    3584 and 4480 (ViT-L 16-frame stretch) OOM and must go split."""
    budget = gf._FUSED_VMEM_BUDGET
    est = gf._fused_vmem_estimate
    assert est(1792, 64, 896, 896) <= budget      # flagship: fused
    assert est(2688, 64, 896, 896) <= budget      # measured pass
    assert est(3584, 64, 896, 896) > budget       # measured scoped OOM
    assert est(4480, 64, 896, 896) > budget       # vitl16 stretch: split
    # smaller tiles shrink the dominant temporaries term
    assert est(3200, 64, 640, 640) <= budget      # measured pass (S=3000)
    assert est(3072, 64, 512, 1024) <= budget     # measured pass, 16.3 ms
    # the per-block-pair row caps catch the estimate's small-block/
    # large-row underprediction (640x640 @ 4480 estimates 10.3 MiB,
    # actual scoped alloc 16.17 — OOM); each cap is the largest
    # measured-good reachable s_pad for that pair
    elig = gf._fused_eligible
    assert elig(1792, 64, 896, 896)               # flagship: fused
    assert elig(3200, 64, 640, 640)               # measured pass
    assert elig(3840, 64, 768, 768)               # measured pass
    assert elig(4608, 64, 512, 512)               # vitl16-class: fused!
    assert not elig(3584, 64, 896, 896)           # measured OOM
    assert not elig(4480, 64, 640, 640)           # est fits, actual OOMs
    assert not elig(4096, 64, 512, 1024)          # measured OOM
    assert not elig(5120, 64, 512, 512)           # measured OOM (edge)
    # unknown user pair falls back to the conservative default cap
    assert not elig(3000, 64, 2048, 128)


def test_block_chooser_prefers_fused_eligible_tiles():
    """At vitl16-class lengths the padding-optimal 896^2 tile forces the
    split backward; the chooser must pick 512^2 instead — fused there
    measured 33.6 ms vs split-896's 35.0 despite 6% more padding."""
    assert gf._choose_blocks(1608) == (896, 896)   # flagship unchanged
    assert gf._choose_blocks(4144) == (512, 512)   # vitl16: fused wins
    # deep into split-only territory both options pay the penalty and
    # padding dominates again
    assert gf._choose_blocks(6000)[0] >= 512


def test_bf16_matches_f32_dense():
    """Production dtype: matmul inputs stay bf16 in-kernel (P is cast to
    bf16 for P@V).  Validate against the f32 dense reference within
    bf16-resolution tolerance, fwd and bwd."""
    b, h, num_img, l, d = 2, 2, 128, 24, 64
    s = num_img + l
    rng = np.random.default_rng(2)
    qf, kf, vf = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
                  for _ in range(3))
    mask = np.ones((b, l), np.int32)
    mask[1, -7:] = 0
    mask = jnp.asarray(mask)
    bias = git_attention_bias(num_img, mask)

    def loss_flash(q, k, v):
        o = gf.git_flash_attention(q.astype(jnp.bfloat16),
                                   k.astype(jnp.bfloat16),
                                   v.astype(jnp.bfloat16), mask, num_img)
        return (o.astype(jnp.float32) ** 2).mean()

    def loss_ref(q, k, v):
        return (_xla_ref(q, k, v, bias).astype(jnp.float32) ** 2).mean()

    out = gf.git_flash_attention(qf.astype(jnp.bfloat16),
                                 kf.astype(jnp.bfloat16),
                                 vf.astype(jnp.bfloat16), mask, num_img)
    ref = _xla_ref(qf, kf, vf, bias)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)
    g = jax.grad(loss_flash, argnums=(0, 1, 2))(qf, kf, vf)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("fused", [True, False])
def test_gradients_match_dense(fused, monkeypatch):
    # both backward formulations (fused single-pass default, split
    # two-pass A/B fallback) must match the dense XLA reference
    monkeypatch.setattr(gf, "FUSED_BWD", fused)
    b, h, num_img, l, d = 1, 2, 128, 16, 64
    s = num_img + l
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = jnp.ones((b, l), jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(gf.git_flash_attention(q, k, v, mask, num_img) ** 2)

    def loss_ref(q, k, v):
        bias = git_attention_bias(num_img, mask)
        return jnp.sum(_xla_ref(q, k, v, bias) ** 2)

    gf_ = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf_, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_model_parity_flash_vs_dense():
    """GITForCausalLM forced flash == forced dense on the same weights."""
    from sasvqa_tpu.models.clip import CLIPVisionConfig
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM

    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_layers=1, num_heads=4, image_size=64,
                          patch_size=8)  # 65 img tokens
    cfg = GITConfig(vocab_size=64, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64,
                    max_position_embeddings=64, vision=vc)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 63, size=(2, 10)), jnp.int32)
    mask = jnp.asarray([[1] * 10, [1] * 7 + [0] * 3], jnp.int32)
    px = jnp.asarray(rng.normal(size=(2, 1, 64, 64, 3)), jnp.float32)
    labels = jnp.where(mask == 1, ids, -100)

    dense = GITForCausalLM(cfg, flash=False)
    flash = GITForCausalLM(cfg, flash=True)
    params = jax.jit(dense.init)(jax.random.key(0), ids, mask, px)

    out_d = jax.jit(lambda p: dense.apply(p, ids, mask, px,
                                          labels=labels))(params)
    out_f = jax.jit(lambda p: flash.apply(p, ids, mask, px,
                                          labels=labels))(params)
    np.testing.assert_allclose(float(out_f["loss"]), float(out_d["loss"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["logits_text"]),
                               np.asarray(out_d["logits_text"]),
                               atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# attention-probability dropout (PARITY #8, retired r4): the kernels
# regenerate the coordinate-hash mask (_hash_keep) from absolute
# (b*h, row, col) coordinates; the XLA implementation
# (dense_attention_with_hash_dropout / hash_dropout_factor) shares only
# the hash function — matching outputs prove in-kernel generation AND
# fwd/bwd mask reproduction.


def _drop_inputs(num_img=128, l=24, b=1, h=2, d=64, seed=11):
    s = num_img + l
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
               for _ in range(3))
    mask = np.ones((b, l), np.int32)
    mask[0, -5:] = 0
    return q, k, v, jnp.asarray(mask), num_img


def test_dropout_keep_rate_and_scale():
    rate = 0.3
    f = np.asarray(gf.hash_dropout_factor(2, 2, 256, jnp.int32(123), rate))
    drop_frac = (f == 0).mean()
    assert abs(drop_frac - rate) < 0.01
    # kept entries carry exactly 1/(1-rate)
    np.testing.assert_allclose(f[f > 0], 1.0 / (1.0 - rate), rtol=1e-6)
    # expectation of the factor is 1 (unbiased)
    assert abs(f.mean() - 1.0) < 0.02
    # per-(b, h) slices decorrelate
    assert not np.array_equal(f[0, 0], f[0, 1])
    assert not np.array_equal(f[0, 0], f[1, 0])


def test_dropout_seed_determinism_and_variation():
    q, k, v, mask, num_img = _drop_inputs()
    run = lambda sd: np.asarray(gf.git_flash_attention(
        q, k, v, mask, num_img, block_q=128, block_k=128,
        dropout_rate=0.2, dropout_seed=jnp.int32(sd)))
    a1, a2, b1 = run(7), run(7), run(8)
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b1)
    # rate 0 with a seed == the plain kernel bitwise
    plain = np.asarray(gf.git_flash_attention(q, k, v, mask, num_img,
                                              block_q=128, block_k=128))
    zero = np.asarray(gf.git_flash_attention(
        q, k, v, mask, num_img, block_q=128, block_k=128,
        dropout_rate=0.0, dropout_seed=jnp.int32(7)))
    np.testing.assert_array_equal(plain, zero)


def test_dropout_fwd_matches_hash_oracle():
    q, k, v, mask, num_img = _drop_inputs()
    rate, seed = 0.25, jnp.int32(42)
    out = gf.git_flash_attention(q, k, v, mask, num_img,
                                 block_q=128, block_k=128,
                                 dropout_rate=rate, dropout_seed=seed)
    ref = gf.dense_attention_with_hash_dropout(
        q, k, v, git_attention_bias(num_img, mask), seed, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("fused", [True, False])
def test_dropout_grads_match_hash_oracle(fused, monkeypatch):
    """Backward mask reproduction: the (differently-iterated) fused AND
    split kernels regenerate the forward's exact mask from coordinates.
    num_img=256 with 128-blocks exercises the mask-free-prefix programs
    (dropout applies there too)."""
    monkeypatch.setattr(gf, "FUSED_BWD", fused)
    q, k, v, mask, num_img = _drop_inputs(num_img=256, l=32)
    rate, seed = 0.25, jnp.int32(5)
    bias = git_attention_bias(num_img, mask)

    def loss_flash(q, k, v):
        o = gf.git_flash_attention(q, k, v, mask, num_img, 128, 128,
                                   dropout_rate=rate, dropout_seed=seed)
        return (o.astype(jnp.float32) ** 2).mean()

    def loss_ref(q, k, v):
        o = gf.dense_attention_with_hash_dropout(q, k, v, bias, seed, rate)
        return (o.astype(jnp.float32) ** 2).mean()

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=2e-4)


def test_model_train_step_with_attention_dropout():
    """GITForCausalLM with attention_dropout > 0: training forward takes
    the hash-dropout path (dense on CPU), is rng-deterministic, differs
    from the deterministic forward, and grads flow."""
    from sasvqa_tpu.models.clip import CLIPVisionConfig
    from sasvqa_tpu.models.git import GITConfig, GITForCausalLM

    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_layers=1, num_heads=4, image_size=64,
                          patch_size=8)
    cfg = GITConfig(vocab_size=64, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64,
                    max_position_embeddings=64, dropout=0.0,
                    attention_dropout=0.3, vision=vc)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, 63, size=(2, 10)), jnp.int32)
    mask = jnp.ones_like(ids)
    px = jnp.asarray(rng.normal(size=(2, 1, 64, 64, 3)), jnp.float32)
    labels = jnp.where(mask == 1, ids, -100)

    model = GITForCausalLM(cfg, flash=False)
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px)

    apply_train = jax.jit(lambda p, r: model.apply(
        p, ids, mask, px, labels=labels, deterministic=False,
        rngs={"dropout": r})["loss"])
    l1 = float(apply_train(params, jax.random.key(1)))
    l1b = float(apply_train(params, jax.random.key(1)))
    l2 = float(apply_train(params, jax.random.key(2)))
    det = float(jax.jit(lambda p: model.apply(
        p, ids, mask, px, labels=labels)["loss"])(params))
    assert l1 == l1b          # same rng -> same mask -> same loss
    assert l1 != l2           # different rng -> different mask
    assert l1 != det          # dropout actually active
    g = jax.grad(lambda p: apply_train(p, jax.random.key(1)))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
