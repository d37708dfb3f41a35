"""Checkpoint save/load (≙ mmcv CheckpointHook payload + reference meta
conventions, ``tools/train.py:219-226``: version + config text + CLASSES +
PALETTE embedded in checkpoint meta).

Format: one msgpack file — ``{'meta': json, 'variables': pytree,
'opt_state': pytree?, 'step': int}`` via flax.serialization. Arrays land as
host numpy; loading returns numpy pytrees that jit feeds directly (no
device-pinning needed — ``jax.device_put`` happens on first use).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(filename: str, variables: Dict[str, Any],
                    opt_state: Any = None, step: int = 0,
                    meta: Optional[dict] = None):
    """Serialize variables (+ optimizer) with a JSON meta payload."""
    meta = dict(meta or {})
    meta.setdefault('time', time.asctime())
    from stc_unet_tpu.version import __version__
    meta.setdefault('stc_unet_tpu_version', __version__)
    payload = {
        'meta': json.dumps(meta, default=_json_default),
        'variables': serialization.msgpack_serialize(
            _to_host(serialization.to_state_dict(variables))),
        'step': int(step),
    }
    if opt_state is not None:
        payload['opt_state'] = serialization.msgpack_serialize(
            _to_host(serialization.to_state_dict(opt_state)))
    os.makedirs(osp.dirname(osp.abspath(filename)), exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = filename + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(blob)
    os.replace(tmp, filename)
    return filename


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, tuple):
        return list(o)
    return str(o)


def load_checkpoint_file(filename: str) -> Dict[str, Any]:
    """Read a checkpoint file → dict(meta, variables, opt_state?, step)."""
    with open(filename, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    out = {
        'meta': json.loads(payload['meta']) if payload.get('meta') else {},
        'variables': serialization.msgpack_restore(payload['variables']),
        'step': int(payload.get('step', 0)),
    }
    if 'opt_state' in payload:
        out['opt_state'] = serialization.msgpack_restore(payload['opt_state'])
    return out


def restore_into(template, state_dict):
    """Shape-checked restore of a serialized state dict into a pytree
    template (optimizer states keep their structure this way)."""
    return serialization.from_state_dict(template, state_dict)


def load_checkpoint(model, filename: str, map_location=None, strict=False,
                    logger=None, revise_keys=()):
    """mmcv-parity loader: install variables into a segmentor wrapper and
    return the raw checkpoint (reference consumes ``meta['CLASSES']`` /
    ``meta['PALETTE']``, ``tools/test.py:229-238``)."""
    ckpt = load_checkpoint_file(filename)
    variables = ckpt['variables']
    if model is not None:
        if getattr(model, 'variables', None) is None:
            model.init_weights()
        model.variables = serialization.from_state_dict(
            model.variables, variables)
        meta = ckpt.get('meta', {})
        if 'CLASSES' in meta:
            model.CLASSES = tuple(meta['CLASSES'])
        if 'PALETTE' in meta:
            model.PALETTE = meta['PALETTE']
    return ckpt
