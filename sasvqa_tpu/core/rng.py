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


def host_fold(seed: int, *data: int) -> np.random.Generator:
    """Derive an independent host Generator PURELY from (seed, *data).

    A pure fold: the same (seed, epoch/step/...) always yields the same
    stream, independent of call order or count — drawing entropy from a
    parent Generator (the r3 original) made the derived stream depend
    on how many times the parent had been consumed, silently breaking
    resume/rng alignment (r3 review finding)."""
    seed_seq = np.random.SeedSequence(entropy=int(seed),
                                      spawn_key=tuple(data))
    return np.random.default_rng(seed_seq)
