"""Distributed seed sync (≙ reference ``core/utils/dist_util.py:12``)."""
from __future__ import annotations

import numpy as np


def sync_random_seed(seed=None, device=None) -> int:
    """All processes agree on one random seed (reference broadcasts a
    rank-0 tensor over NCCL; here process 0's value is broadcast through
    ``multihost_utils``). Single-process: just draw one."""
    if seed is None:
        seed = int(np.random.randint(2**31))
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(
            np.asarray(seed, np.int64)))
    return seed


def check_dist_init() -> bool:
    """≙ reference ``core/utils/dist_util.py`` ``check_dist_init``:
    torch ``dist.is_available() and dist.is_initialized()`` maps to
    running with more than one jax process."""
    import jax
    return jax.process_count() > 1
