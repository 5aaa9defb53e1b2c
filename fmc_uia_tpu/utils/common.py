"""Seeding and small utilities.

The reference seeds python/numpy/torch + cuDNN-deterministic
(code/utils/common.py:8-16). In JAX, determinism is structural: all device
randomness flows through explicit PRNG keys. ``set_seed`` seeds the host-side
RNGs (sampler, numpy splits) and returns the root ``jax.random`` key that the
training loop threads through augmentation/dropout.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_parameters(params) -> int:
    """Total number of parameters in a pytree (reference common.py:34-36)."""
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def tree_size_bytes(tree) -> int:
    """Total byte size of all arrays in a pytree."""
    return int(
        sum(
            np.prod(x.shape) * jnp.dtype(x.dtype).itemsize
            for x in jax.tree_util.tree_leaves(tree)
        )
    )
