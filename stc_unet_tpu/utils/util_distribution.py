"""Device/parallel helpers (≙ reference ``mmseg/utils/util_distribution.py``).

The reference wraps models in MMDataParallel/MMDistributedDataParallel;
under pjit both collapse to "shard the batch over the mesh", so these
functions return the model unchanged (the mesh lives in the train step) and
exist for API parity with reference call sites.
"""
from __future__ import annotations

import jax


def get_device() -> str:
    """'tpu' / 'gpu' / 'cpu' (≙ reference ``get_device``, ``:74``)."""
    return jax.default_backend()


def build_dp(model, device=None, dim=0, **kwargs):
    """Single-process data parallel ≙ pjit over local devices — no wrapper
    needed; returns the model (reference ``build_dp``, ``:13``)."""
    return model


def build_ddp(model, device=None, **kwargs):
    """Multi-process data parallel ≙ pjit over the global mesh — no wrapper
    needed; returns the model (reference ``build_ddp``, ``:39``)."""
    return model


def is_mlu_available() -> bool:
    return False


def init_dist(launcher: str = 'jax', backend: str = 'jax', **kwargs):
    """Initialize multi-host jax (≙ mmcv ``init_dist``). No-op when already
    initialized or single-host."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass


def get_dist_info():
    """(rank, world_size) ≙ mmcv ``get_dist_info``."""
    return jax.process_index(), jax.process_count()
