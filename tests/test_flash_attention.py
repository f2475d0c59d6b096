"""Pallas flash attention vs XLA reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sasvqa_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.set_interpret_mode(True)
    yield
    fa.set_interpret_mode(False)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(dtype))


@pytest.mark.parametrize("lq,lk", [(128, 128), (256, 384)])
def test_matches_reference_no_bias(lq, lk):
    b, h, d = 2, 2, 64
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)   # lk != lq exercises the rectangular
    v = _rand((b, h, lk, d), 2)   # no-bias grid (nq != nk)
    out = fa.flash_attention(q, k, v)
    ref = fa._xla_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_matches_reference_with_bias_and_padding():
    # odd lengths force padding; per-batch bias (B, 1, Lq, Lk)
    b, h, lq, lk, d = 2, 2, 130, 200, 64
    q = _rand((b, h, lq, d), 0)
    k = _rand((b, h, lk, d), 1)
    v = _rand((b, h, lk, d), 2)
    mask = np.zeros((b, 1, lq, lk), np.float32)
    mask[:, :, :, -30:] = fa.NEG_INF   # mask the last keys
    out = fa.flash_attention(q, k, v, jnp.asarray(mask))
    ref = fa._xla_reference(q, k, v, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_causal_bias():
    from sasvqa_tpu.ops.attention import causal_bias
    b, h, l, d = 1, 2, 256, 64
    q, k, v = (_rand((b, h, l, d), i + 5) for i in range(3))
    bias = causal_bias(l)
    out = fa.flash_attention(q, k, v, bias)
    ref = fa._xla_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bf16_inputs():
    b, h, l, d = 1, 2, 128, 64
    q, k, v = (_rand((b, h, l, d), i, np.float32).astype(jnp.bfloat16)
               for i in range(3))
    out = fa.flash_attention(q, k, v)
    ref = fa._xla_reference(q, k, v, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_gradients_flow():
    b, h, l, d = 1, 2, 128, 64
    q, k, v = (_rand((b, h, l, d), i + 9) for i in range(3))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(fa._xla_reference(q, k, v, None) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def _grad_pair(lq, lk, bias=None, dtype=np.float32, bq=128, bk=128,
               seed=0):
    """(flash grads, XLA grads) of a scalar loss wrt q, k, v."""
    q = _rand((1, 2, lq, 64), seed, dtype)
    k = _rand((1, 2, lk, 64), seed + 1, dtype)
    v = _rand((1, 2, lk, 64), seed + 2, dtype)
    w = _rand((1, 2, lq, 64), seed + 3, dtype)  # non-uniform cotangent

    def loss_flash(q, k, v):
        return (fa.flash_attention(q, k, v, bias, bq, bk)
                .astype(jnp.float32) * w.astype(jnp.float32)).sum()

    def loss_xla(q, k, v):
        return (fa._xla_reference(q, k, v, bias).astype(jnp.float32)
                * w.astype(jnp.float32)).sum()

    return (jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v),
            jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v))


def _assert_grads_close(got, want, atol=2e-4, rtol=2e-3):
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=atol, rtol=rtol, err_msg=name)


def test_pallas_backward_matches_xla_long_seq():
    """VERDICT r2 #8: Pallas dQ/dKV at S>=1024, no O(S^2) transient."""
    got, want = _grad_pair(1024, 1024)
    _assert_grads_close(got, want)


def test_pallas_backward_nondividing_and_rect():
    got, want = _grad_pair(300, 520)   # pads 300->384 q, 520->640 k
    _assert_grads_close(got, want)


def test_pallas_backward_row_bias():
    """Key-padding (row-broadcast) bias: O(Lk) block in both passes."""
    lk = 256
    keep = np.zeros((1, 1, 1, lk), np.float32)
    keep[..., lk // 2:] = fa.NEG_INF
    got, want = _grad_pair(256, lk, bias=jnp.asarray(keep))
    _assert_grads_close(got, want)
    # masked keys receive (near-)zero dK/dV
    assert np.abs(np.asarray(got[1])[:, :, lk // 2:, :]).max() < 1e-6


def test_pallas_backward_full_2d_bias_causal():
    lq = lk = 256
    causal = np.where(np.arange(lk)[None, :] > np.arange(lq)[:, None],
                      fa.NEG_INF, 0.0).astype(np.float32)[None, None]
    got, want = _grad_pair(lq, lk, bias=jnp.asarray(causal))
    _assert_grads_close(got, want)


def test_pallas_backward_bf16():
    # bf16 storage path: compare in f32 at bf16 tolerance
    gotb, wantb = _grad_pair(256, 256, dtype=jnp.bfloat16)
    for g, r, name in zip(gotb, wantb, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=name)


def test_bias_cotangent_correct_when_live():
    """A differentiable bias still gets a correct cotangent (XLA
    fallback expression, DCE'd when the bias has no grad path)."""
    lq = lk = 128
    q = _rand((1, 1, lq, 64), 0)
    k = _rand((1, 1, lk, 64), 1)
    v = _rand((1, 1, lk, 64), 2)
    bias0 = _rand((1, 1, lq, lk), 3) * 0.1

    g_flash = jax.grad(lambda b: fa.flash_attention(
        q, k, v, b, 128, 128).sum())(bias0)
    g_xla = jax.grad(lambda b: fa._xla_reference(q, k, v, b).sum())(bias0)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_xla),
                               atol=2e-4, rtol=2e-3)
