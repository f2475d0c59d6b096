"""Video-text retrieval metrics + multi-clip score aggregation.

Capability preserved from the reference's (vestigial) retrieval path
(SURVEY.md §2.3): Recall@K / MedR / MeanR
(src/tasks/run_video_retrieval.py:519-543) and mean/max/LSE multi-clip
score pooling (:404-418; the ``score_agg_func`` flag lives in shared
config configs/config.py:99-101 and every live JSON sets "lse").
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def aggregate_clip_scores(scores: jax.Array, agg: str = "lse",
                          axis: int = -1) -> jax.Array:
    """Pool per-clip scores along ``axis``: mean / max / LogSumExp."""
    if agg == "mean":
        return jnp.mean(scores, axis=axis)
    if agg == "max":
        return jnp.max(scores, axis=axis)
    if agg == "lse":
        return jax.scipy.special.logsumexp(scores, axis=axis)
    raise ValueError(f"unknown score_agg_func {agg!r}")


def retrieval_metrics(score_matrix: np.ndarray) -> Dict[str, float]:
    """score_matrix (N_text, N_video), diagonal = ground truth.

    Returns text->video R@1/5/10 (%), MedR, MeanR.
    """
    n = score_matrix.shape[0]
    # rank of the true video for each text query (0-based)
    order = np.argsort(-score_matrix, axis=1)
    ranks = np.empty(n, dtype=np.int64)
    for i in range(n):
        ranks[i] = int(np.where(order[i] == i)[0][0])
    return {
        "r1": float(100.0 * np.mean(ranks < 1)),
        "r5": float(100.0 * np.mean(ranks < 5)),
        "r10": float(100.0 * np.mean(ranks < 10)),
        "medianR": float(np.median(ranks) + 1),
        "meanR": float(np.mean(ranks) + 1),
    }


def similarity_matrix(text_embeds: jax.Array, video_embeds: jax.Array,
                      normalize: bool = True) -> jax.Array:
    """(Nt, D) x (Nv, D) -> (Nt, Nv) cosine / dot similarity, on device."""
    if normalize:
        text_embeds = text_embeds / jnp.linalg.norm(
            text_embeds, axis=-1, keepdims=True)
        video_embeds = video_embeds / jnp.linalg.norm(
            video_embeds, axis=-1, keepdims=True)
    return text_embeds @ video_embeds.T
