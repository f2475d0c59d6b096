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
