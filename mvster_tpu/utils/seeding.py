"""Determinism helpers.

The reference seeds python/numpy/torch/cuda and still loses determinism to
cudnn.benchmark (train_mvs4.py:14, utils.py:253-257).  Under jit, compute is
deterministic given the PRNG key; the only stochastic host-side pieces are
the data augmentations, which take explicit seeds.  This helper seeds the
host RNGs and returns the jax root key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
