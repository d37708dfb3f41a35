"""Misc utilities: latest-checkpoint scan, env fingerprint.

Equivalents of reference ``mmseg/utils/misc.py:7`` (find_latest_checkpoint)
and ``mmseg/utils/collect_env.py:8`` (collect_env).
"""
from __future__ import annotations

import glob
import os.path as osp
import platform
import sys


def find_latest_checkpoint(path: str, suffix: str = 'ckpt'):
    """Find the most recent checkpoint in ``path``.

    Orbax checkpoints are directories named ``<name>_<step>.<suffix>`` or the
    msgpack files we write as ``*.{suffix}``; ``latest.{suffix}`` wins if
    present. Mirrors reference ``find_latest_checkpoint`` (``utils/misc.py:7``)
    which scans a work_dir for the newest ``.pth``.
    """
    if not osp.exists(path):
        return None
    latest = osp.join(path, f'latest.{suffix}')
    if osp.exists(latest):
        return latest
    checkpoints = glob.glob(osp.join(path, f'*.{suffix}'))
    if not checkpoints:
        return None
    latest_path, latest_step = None, -1
    for ckpt in checkpoints:
        stem = osp.splitext(osp.basename(ckpt))[0]
        digits = ''.join(c for c in stem if c.isdigit())
        step = int(digits) if digits else 0
        if step > latest_step:
            latest_step, latest_path = step, ckpt
    return latest_path


def collect_env() -> dict:
    """Environment fingerprint for logs (≙ reference ``collect_env.py:8``)."""
    import jax
    import numpy as np
    env = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'platform': platform.platform(),
        'jax': jax.__version__,
        'numpy': np.__version__,
        'jax_backend': jax.default_backend(),
        'jax_devices': ', '.join(str(d) for d in jax.devices()),
        'device_count': jax.device_count(),
    }
    try:
        import flax
        env['flax'] = flax.__version__
    except ImportError:
        pass
    try:
        import optax
        env['optax'] = optax.__version__
    except ImportError:
        pass
    from stc_unet_tpu.version import __version__
    env['stc_unet_tpu'] = __version__
    return env
