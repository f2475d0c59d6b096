"""Deterministic RNG plumbing.

The reference seeds python/numpy/torch RNGs globally
(src/utils/misc.py:21-25).  The TPU-native design is explicit: one root
``jax.random.key`` threaded through the program; host-side numpy RNG is
a seeded Generator, never the global singleton.
"""

from __future__ import annotations

import random
from typing import Tuple

import jax
import numpy as np


def set_random_seed(seed: int) -> Tuple[jax.Array, np.random.Generator]:
    """Seed host RNGs and return (jax root key, numpy Generator)."""
    random.seed(seed)
    np.random.seed(seed)  # for any library that reaches the global RNG
    return jax.random.key(seed), np.random.default_rng(seed)


def host_fold(rng: np.random.Generator, *data: int) -> np.random.Generator:
    """Derive an independent host Generator from integers (e.g. epoch, step)."""
    seed_seq = np.random.SeedSequence(
        entropy=int(rng.integers(0, 2**63 - 1)), spawn_key=tuple(data))
    return np.random.default_rng(seed_seq)
