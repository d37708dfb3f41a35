"""Block-size / compiler-param sweep for the fused CoordAtt kernels.

Times strip_pools and gate_add separately at the dominant slide-tile
stage (B=126, 256², C=128) across block budgets, plus a
dimension_semantics variant, to pick the production block size.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import stc_unet_tpu.ops.coordatt_fused as caf


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def _time(fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    rec = []
    for (hw, c) in ((256, 128), (128, 256)):
        x = jnp.asarray(rng.rand(126, hw, hw, c), jnp.bfloat16)
        a_h = jnp.asarray(rng.rand(126, hw, c), jnp.bfloat16)
        a_w = jnp.asarray(rng.rand(126, hw, c), jnp.bfloat16)
        for mb in (1, 2, 4, 8):
            caf._BLOCK_BYTES = mb << 20
            try:
                tp = _time(jax.jit(lambda x: caf._pools_call(x)), x)
            except Exception as e:
                tp = repr(e)[:60]
            try:
                ta = _time(jax.jit(
                    lambda x, h, w: caf._gate_add_call(x, h, w)),
                    x, a_h, a_w)
            except Exception as e:
                ta = repr(e)[:60]
            r = dict(hw=hw, c=c, block_mb=mb, pools_ms=tp, apply_ms=ta)
            rec.append(r)
            print(r, flush=True)
    caf._BLOCK_BYTES = 2 << 20
    with open('/tmp/ca_tune.json', 'w') as f:
        json.dump(rec, f, indent=1)


if __name__ == '__main__':
    main()
