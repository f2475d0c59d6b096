"""MLM token masking (80/10/10) — pretraining capability.

Preserved from the reference's pretrain path (SURVEY.md §2.3,
src/datasets/data_utils.py:20-67): mask 15% of tokens; of those, 80%
become [MASK], 10% a random token, 10% unchanged; unmasked positions get
label -1/-100.  Implemented as a pure jittable function over a PRNG key
(host numpy variant included for the input pipeline).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

IGNORE = -100


def mask_tokens_jax(key: jax.Array, input_ids: jax.Array,
                    mask_token_id: int, vocab_size: int,
                    special_mask: jax.Array,
                    mlm_prob: float = 0.15) -> Tuple[jax.Array, jax.Array]:
    """-> (masked_ids, labels).  special_mask (B, L): 1 = never mask."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, input_ids.shape)
    select = (u < mlm_prob) & (special_mask == 0)
    labels = jnp.where(select, input_ids, IGNORE)

    u2 = jax.random.uniform(k2, input_ids.shape)
    use_mask = select & (u2 < 0.8)
    use_rand = select & (u2 >= 0.8) & (u2 < 0.9)
    rand_tok = jax.random.randint(k3, input_ids.shape, 0, vocab_size)
    out = jnp.where(use_mask, mask_token_id, input_ids)
    out = jnp.where(use_rand, rand_tok, out)
    return out, labels


def mask_tokens_numpy(rng: np.random.Generator, input_ids: np.ndarray,
                      mask_token_id: int, vocab_size: int,
                      special_mask: np.ndarray,
                      mlm_prob: float = 0.15) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side twin of :func:`mask_tokens_jax`."""
    u = rng.random(input_ids.shape)
    select = (u < mlm_prob) & (special_mask == 0)
    labels = np.where(select, input_ids, IGNORE)
    u2 = rng.random(input_ids.shape)
    out = np.array(input_ids)
    out[select & (u2 < 0.8)] = mask_token_id
    rand_pos = select & (u2 >= 0.8) & (u2 < 0.9)
    out[rand_pos] = rng.integers(0, vocab_size, rand_pos.sum())
    return out, labels
