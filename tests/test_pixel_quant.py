"""u8 pixel-staging wire format (core/pixels.py).

The frame store holds normalize_frames outputs — an affine image of the
uint8 grid — so quantize/dequantize must be LOSSLESS on stage-A frames
and half-a-u8-step-bounded off-grid.  This is the reference's own wire
format (uint8 H2D + on-GPU ImageNorm, dataloader.py:85-144).
"""

import numpy as np
import pytest

from sasvqa_tpu.core.pixels import (CLIP_MEAN, CLIP_STD, dequantize,
                                    maybe_dequantize, quantize_u8)
from sasvqa_tpu.tools.extract_frames import normalize_frames


def test_on_grid_roundtrip_is_lossless():
    """Stage-A frames (normalize_frames of uint8) quantize back to the
    exact source bytes, and device dequantization reproduces the stored
    f32 values BITWISE (same op order as normalize_frames)."""
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(3, 8, 8, 3), dtype=np.uint8)
    stored = normalize_frames(u8)                    # what stage A writes
    q = quantize_u8(stored)
    np.testing.assert_array_equal(q, u8)
    import jax.numpy as jnp
    deq = np.asarray(dequantize(jnp.asarray(q), jnp.float32))
    np.testing.assert_array_equal(deq, stored)


def test_off_grid_error_bounded_by_half_step():
    """Arbitrary floats inside the representable span round to the
    nearest grid point: |x - deq(quant(x))| <= 0.5/(255*std_c)."""
    rng = np.random.default_rng(1)
    lo = (0.0 - CLIP_MEAN) / CLIP_STD
    hi = (1.0 - CLIP_MEAN) / CLIP_STD
    x = rng.uniform(lo, hi, size=(4, 8, 8, 3)).astype(np.float32)
    import jax.numpy as jnp
    deq = np.asarray(dequantize(jnp.asarray(quantize_u8(x)), jnp.float32))
    bound = 0.5 / (255.0 * CLIP_STD) + 1e-6
    assert (np.abs(deq - x) <= bound).all()
    # out-of-span values clip to the span edge, not wrap
    over = np.full((1, 1, 1, 3), 100.0, np.float32)
    q = quantize_u8(over)
    np.testing.assert_array_equal(q, 255)


def test_maybe_dequantize_passthrough_floats():
    """Float pixels pass through UNTOUCHED (same object) — the float
    path's numerics are parity-pinned and must not change."""
    import jax.numpy as jnp
    x = jnp.ones((2, 1, 4, 4, 3), jnp.bfloat16)
    assert maybe_dequantize(x, jnp.bfloat16) is x
    u = jnp.zeros((2, 1, 4, 4, 3), jnp.uint8)
    out = maybe_dequantize(u, jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


def test_pixel_dtype_for_precedence():
    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.dataset import pixel_dtype_for
    assert pixel_dtype_for(ConfigDict({})) == "bf16"
    assert pixel_dtype_for(ConfigDict({"stage_pixels_bf16": 0})) == "f32"
    assert pixel_dtype_for(ConfigDict({"stage_pixels_u8": 1})) == "u8"
    assert pixel_dtype_for(ConfigDict(
        {"stage_pixels_u8": 1, "stage_pixels_bf16": 0})) == "u8"


def _items(n_groups=2, k=6, hw=16, on_grid=True, seed=2):
    """Minimal collator items with on-grid (stage-A-like) frames."""
    rng = np.random.default_rng(seed)
    items = []
    for g in range(n_groups):
        if on_grid:
            vid = normalize_frames(rng.integers(
                0, 256, size=(k, hw, hw, 3), dtype=np.uint8))
        else:
            vid = rng.normal(size=(k, hw, hw, 3)).astype(np.float32)
        items.append(dict(
            vid=vid, n_examples=1, sampled_inds=None,
            examples=[dict(q_str=f"what is thing {g}",
                           question_id=g, label=0, str_label="a")]))
    return items


def test_collator_u8_stages_exact_wire_bytes():
    """ClassifierCollator(pixel_dtype='u8') emits uint8 whose
    dequantization equals the f32-staged batch bitwise (on-grid
    frames, same collation rng -> same frame selection)."""
    from sasvqa_tpu.data.dataset import ClassifierCollator
    from sasvqa_tpu.data.tokenization import make_test_wordpiece
    tok = make_test_wordpiece()
    kw = dict(max_txt_len=12, nframe=2, samp_policy="random")
    col_u8 = ClassifierCollator(tok, pixel_dtype="u8", **kw)
    col_f32 = ClassifierCollator(tok, pixel_dtype="f32", **kw)
    items = _items()
    b_u8 = col_u8(items, rng=np.random.default_rng(7))
    b_f32 = col_f32(items, rng=np.random.default_rng(7))
    assert b_u8["visual_inputs"].dtype == np.uint8
    import jax.numpy as jnp
    deq = np.asarray(dequantize(jnp.asarray(b_u8["visual_inputs"]),
                                jnp.float32))
    np.testing.assert_array_equal(deq, b_f32["visual_inputs"])


def test_model_forward_u8_equals_f32(cpu_devices):
    """A tiny f32 CLIPVideoQA produces f32-ulp-identical logits from
    u8-staged on-grid pixels and from the f32 pixels they encode.

    Not bitwise: inside jit, XLA's algebraic simplifier rewrites the
    dequant division-by-constant into a reciprocal multiply (<= 1 ulp
    on the reconstructed pixels — measured max logits diff 2.4e-7
    here).  Under the real bf16 activation policy that is ~300x below
    one bf16 step, so u8 staging remains strictly more faithful than
    bf16 staging."""
    import jax
    import jax.numpy as jnp
    from sasvqa_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    from sasvqa_tpu.models.video_qa import CLIPVideoQA, ClassifierHeadConfig

    tc = CLIPTextConfig(vocab_size=64, hidden_size=16,
                        intermediate_size=32, num_layers=1, num_heads=2,
                        max_position_embeddings=8, eos_token_id=63)
    vc = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                          num_layers=1, num_heads=2, image_size=16,
                          patch_size=8, projection_dim=16)
    model = CLIPVideoQA(tc, vc, ClassifierHeadConfig(num_labels=5))
    ids = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones_like(ids)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 1, 16, 16, 3), dtype=np.uint8)
    px_f32 = jnp.asarray(normalize_frames(u8))
    params = jax.jit(model.init)(jax.random.key(0), ids, mask, px_f32)
    apply = jax.jit(model.apply)
    out_f32 = apply(params, ids, mask, px_f32)
    out_u8 = apply(params, ids, mask, jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(out_u8["logits"]),
                               np.asarray(out_f32["logits"]),
                               rtol=0, atol=1e-6)
