"""uint8 wire format for normalized pixel staging.

Frame stores hold HF-processor-normalized float frames
``x = (u/255 - mean_c) / std_c`` where ``u`` is the uint8 output of the
geometry (resize/crop) stage — see ``tools/extract_frames.py``
``normalize_frames`` (the CLIPImageProcessor pipeline the reference
pushes decoded frames through, prefetch_loader.py:57-67).  The stored
floats therefore lie exactly on an affine image of the uint8 grid, so
inverting the affine and rounding recovers ``u`` EXACTLY, and
re-applying the normalize on device reproduces the stored f32 values
bitwise in eager op order (inside jit, XLA rewrites the
division-by-constant into a reciprocal multiply — <= 1 f32 ulp, ~300x
below one bf16 step of the real activation policy): for stage-A stores
the u8 wire format is **lossless to f32 ulp**, at half the bytes of
bf16 staging and a quarter of f32 — and strictly more faithful than
the bf16 default.

For off-grid inputs (values that never came from the normalize affine,
e.g. gaussian synthetic fixtures) the roundtrip error is bounded by
half a u8 step, ``0.5/(255*std_c)`` = 0.0073-0.0077 — the same order as
bf16's own resolution at these magnitudes (2^-8 steps at |x| in [1,2)).

This is also the reference's own wire format: its live prefetch ships
uint8 to the GPU and normalizes there (datasets/dataloader.py:85-144 +
data_utils.py:253-273 ImageNorm) — the rebuild's default bf16 staging
normalizes on host only because the store is pre-normalized.

Host->device pixel bytes are the measured bottleneck of every
end-to-end path on H2D-constrained hosts (BASELINE.md round 5: 82-87%
of an integrated sandbox step, ~85% of serve latency), so the wire
format is a first-class knob: ``--stage_pixels_u8`` (opt-in; the bf16
default keeps the recorded bench history comparable).

Dequantization runs INSIDE the jitted step, at the model wrappers'
pixel entry points (``CLIPVideoQA.encode_video``,
``BLIPVideoQA._encode``, ``GITModel.encode_frames``) — XLA fuses the
u8->f32 affine into the patch-embedding conv's input, so it costs no
extra HBM round trip.
"""

from __future__ import annotations

import numpy as np

# CLIP-style normalization constants shared by the HF processors of all
# three model families (CLIP / BLIP / GIT all use the OpenAI-CLIP
# mean/std).  Single source of truth — tools/extract_frames re-exports.
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# quantize: u = rint(x * 255*std + 255*mean), the exact inverse of
# normalize_frames' (u/255 - mean)/std
_Q_SCALE = (255.0 * CLIP_STD).astype(np.float32)
_Q_BIAS = (255.0 * CLIP_MEAN).astype(np.float32)


def quantize_u8(frames: np.ndarray) -> np.ndarray:
    """Normalized float frames ``(..., 3)`` -> uint8 wire format.

    Exact on the stage-A grid (see module docstring); off-grid values
    round to the nearest grid point (<= half-step error) and
    out-of-range values clip to the representable [0, 255] span."""
    q = frames * _Q_SCALE + _Q_BIAS
    np.rint(q, out=q)
    np.clip(q, 0.0, 255.0, out=q)
    return q.astype(np.uint8)


def dequantize(pixel_values, dtype):
    """uint8 wire frames -> normalized pixels in ``dtype`` (jax).

    Mirrors ``normalize_frames``' op order exactly (u8 -> f32, /255,
    -mean, /std, all in f32) so on-grid values reproduce the stored
    f32 bitwise before the final activation-dtype cast."""
    import jax.numpy as jnp
    x = pixel_values.astype(jnp.float32) / np.float32(255.0)
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return x.astype(dtype)


def maybe_dequantize(pixel_values, dtype):
    """Dequantize u8-staged pixels; pass float pixels through unchanged
    (the float path's numerics are parity-pinned — this must be a
    no-op there)."""
    import jax.numpy as jnp
    if pixel_values.dtype == jnp.uint8:
        return dequantize(pixel_values, dtype)
    return pixel_values
