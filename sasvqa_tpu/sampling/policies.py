"""Online frame re-sampling policies.

The collators re-sample ``nframe`` of the K stored frames per video at
batch time (reference: src/datasets/dataset_video_qa.py:203-216,343-362).
Index selection is pure integer math — implemented here as numpy
functions usable on the host pipeline and mirrored as jnp for on-device
use.  Policies (reference semantics preserved exactly):

- ``uniform``:   indices 0, n, 2n, ... (stride = nframe!  The reference
  strides by nframe and keeps ceil(K/nframe) frames — NOT "pick nframe
  uniformly".  dataset_video_qa.py:204-206.)
- ``random``:    nframe distinct *index-weighted* picks: the reference
  draws ``torch.multinomial(torch.arange(K).float(), nframe)`` without
  replacement (dataset_video_qa.py:207-209), so frame i is drawn with
  probability proportional to i — frame 0 is never sampled.  Replicated
  exactly (sequential renormalized draws).
- ``single``:    the middle frame (K//2), one frame
- ``question-caption`` (MIF): first nframe of the precomputed
  ``sampled_inds`` importance ordering (dataset_video_qa.py:356-359)
- ``importance``: first nframe stored frames (assumes store is already
  importance-ordered; dataset_video_qa.py:360-361)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

POLICIES = ("uniform", "random", "single", "question-caption", "importance")


def num_output_frames(policy: str, num_stored: int, nframe: int) -> int:
    """Static output frame count per policy (fixed shapes under jit)."""
    if policy == "uniform":
        return num_stored // nframe + (1 if num_stored % nframe else 0)
    if policy == "single":
        return 1
    if policy in ("random", "question-caption", "importance"):
        return nframe
    raise ValueError(f"unknown samp_policy {policy!r}")


def sample_indices(policy: str, num_stored: int, nframe: int,
                   rng: Optional[np.random.Generator] = None,
                   sampled_inds: Optional[np.ndarray] = None,
                   batch_size: int = 1) -> np.ndarray:
    """Return (batch_size, T_out) int32 frame indices into the K stored
    frames, following the reference collator's exact semantics."""
    t_out = num_output_frames(policy, num_stored, nframe)
    if policy == "uniform":
        inds = np.arange(t_out, dtype=np.int64) * nframe
        return np.broadcast_to(inds, (batch_size, t_out)).astype(np.int32)
    if policy == "single":
        mid = num_stored // 2
        return np.full((batch_size, 1), mid, dtype=np.int32)
    if policy == "random":
        assert rng is not None, "random policy needs an rng"
        # torch.multinomial(arange(K), nframe, replacement=False): index-
        # weighted sequential renormalized draws (dataset_video_qa.py:
        # 207-209); frame 0 has weight 0 so nframe must leave K-1
        # samplable frames.  Implemented as Gumbel-top-k (keys =
        # log w + Gumbel noise, take the nframe largest), which is
        # distributionally identical to the sequential draws including
        # the selection ORDER (Efraimidis-Spirakis / Vieira 2014) and
        # vectorizes over the batch instead of a B x nframe Python loop.
        assert nframe <= num_stored - 1, (
            f"random policy: nframe={nframe} > {num_stored - 1} nonzero-"
            f"weight frames (frame 0 has probability 0)")
        with np.errstate(divide="ignore"):  # log(0) -> -inf for frame 0
            logw = np.log(np.arange(num_stored, dtype=np.float64))
        if isinstance(rng, (list, tuple)):
            # one INDEPENDENT generator per row: eval passes per-(group,
            # clip) seeded rngs so each row's draw depends only on its
            # own identity — invariant to batch composition, process
            # count, and plan padding (tasks/run_video_qa.validate)
            assert len(rng) == batch_size, (len(rng), batch_size)
            noise = np.stack([r.gumbel(size=num_stored) for r in rng])
        else:
            noise = rng.gumbel(size=(batch_size, num_stored))
        keys = logw + noise
        order = np.argsort(-keys, axis=1)[:, :nframe]
        return order.astype(np.int32)
    if policy == "question-caption":
        assert sampled_inds is not None, "MIF policy needs sampled_inds"
        si = np.asarray(sampled_inds)[:, :nframe]
        assert si.shape == (batch_size, nframe), si.shape
        return si.astype(np.int32)
    if policy == "importance":
        inds = np.arange(nframe, dtype=np.int32)
        return np.broadcast_to(inds, (batch_size, nframe)).copy()
    raise ValueError(f"unknown samp_policy {policy!r}")


def gather_frames(frames: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """frames (B, K, ...) + indices (B, T) -> (B, T, ...)."""
    b = frames.shape[0]
    return frames[np.arange(b)[:, None], indices]
