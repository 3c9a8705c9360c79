"""Seeding & determinism (reference: HPE/utils/dist.py:14-43 set_seed).

On TPU, XLA is deterministic by default (modulo cross-replica reduction
order), so the CUDA knobs (cudnn.deterministic, CUBLAS_WORKSPACE_CONFIG)
have no analog; the switchable debug mode here is jax_debug_nans
(SURVEY.md §5.2).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42, deterministic: bool = False, debug_nans: bool = False):
    """Seed python/numpy and return a jax PRNGKey.

    Unlike torch, JAX RNG is functional: the returned key is the single
    source of randomness for model init / dropout / data augmentation and
    must be split explicitly — there is no global generator to corrupt.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)

    import jax

    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if deterministic:
        # XLA on TPU is bitwise deterministic for a fixed program + sharding;
        # this flag keeps host-side reductions deterministic as well.
        os.environ.setdefault("XLA_FLAGS", "")
    return jax.random.PRNGKey(seed)
