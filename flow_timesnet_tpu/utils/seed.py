"""Deterministic seeding.

JAX programs are deterministic by construction on TPU given fixed PRNG keys
(the reference needed cuDNN/cuBLAS knobs instead — ``utils/seed.py:10-38``);
this module seeds the host-side RNGs (python/numpy, used for data shuffling
and augmentation) and hands out the root JAX key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int, deterministic: bool = False) -> jax.Array:
    """Seed python/numpy RNGs and return the root JAX PRNG key.

    ``deterministic`` additionally forces highest matmul precision so that
    float32 contractions do not use the default bf16-passes on TPU.
    """

    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        jax.config.update("jax_default_matmul_precision", "highest")
    return jax.random.PRNGKey(seed)
