"""Component-level fwd/bwd timing for MaxViT-UNet at real train shapes
(VERDICT r3 weak #1 follow-up).

The round-4 tier probe showed the remat mode barely matters (B=8 'attn'
7.51 img/s vs 'block' 7.46) — so the backward itself is pathological, not
the recompute. This probe times value_and_grad of each sub-module (MBConv,
window transformer, grid transformer) at each encoder stage's true shape
(512² input, B=8: 128²/64, 64²/128, 32²/256, 16²/512), in three variants:

- train=True with the config's dropout rates (attn_drop/drop/drop_path 0.1)
- train=True with all drop rates zeroed (isolates RNG/mask cost — the
  stage-1 attention matrix is (2048, 32, 64, 64) ≈ 268M elements, so a
  dropout mask on it is ~0.5 GB of bf16 traffic per call)
- fwd-only (train=True, drops on) for the fwd:bwd ratio

Output: docs/data/maxvit_bwd_probe.json
Usage: python tools/probe_maxvit_bwd.py [--stages 0 1 2 3]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 2
ITERS = 8


def _readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def time_queued(fn, *args):
    """Median of ITERS queued calls bounded by ONE readback (bench protocol:
    per-call readback costs ~36 ms tunnel RTT)."""
    for _ in range(WARMUP):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    _readback(outs[-1])
    return (time.perf_counter() - t0) / ITERS


STAGE_SHAPES = [  # post-MBConv feature shapes per encoder stage, B=8 512²
    (8, 128, 128, 64),
    (8, 64, 64, 128),
    (8, 32, 32, 256),
    (8, 16, 16, 512),
]


def probe_module(make_mod, x, train_rngs):
    """Times fwd and fwd+bwd of a flax module on input x (bf16)."""
    mod = make_mod()
    variables = mod.init(dict(params=jax.random.PRNGKey(0), **train_rngs),
                         x, train=True)

    @jax.jit
    def fwd(v, y):
        out = mod.apply(v, y, train=True, rngs=train_rngs,
                        mutable=['batch_stats'])[0]
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwdbwd(v, y):
        def loss(vv, yy):
            out = mod.apply(vv, yy, train=True, rngs=train_rngs,
                            mutable=['batch_stats'])[0]
            return jnp.sum(out.astype(jnp.float32))
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(v, y)
        return l, g

    t_f = time_queued(fwd, variables, x)
    t_fb = time_queued(fwdbwd, variables, x)
    return t_f, t_fb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stages', nargs='*', type=int, default=[0, 1, 2, 3])
    ap.add_argument('--out', default=_osp.join(
        _repo_root, 'docs', 'data', 'maxvit_bwd_probe.json'))
    args = ap.parse_args()

    from stc_unet_tpu.models.utils.maxvit_core import (MBConv,
                                                       MaxViTTransformerBlock)

    results = {}
    if _osp.exists(args.out):
        results = json.load(open(args.out))

    rngs = {'dropout': jax.random.PRNGKey(1)}
    for si in args.stages:
        b, h, w, c = STAGE_SHAPES[si]
        key = f'stage{si}_{h}x{w}x{c}'
        recs = results.setdefault(key, {})
        x = jnp.asarray(
            np.random.RandomState(si).rand(b, h, w, c), jnp.bfloat16)
        # MBConv input is the PRE-stage map (downscale halves spatial)
        x_pre = jnp.asarray(np.random.RandomState(si).rand(
            b, h * 2, w * 2, c // 2 if si else c), jnp.bfloat16)

        cases = {
            'mbconv': (lambda c=c: MBConv(c, downscale=True,
                                          drop_path=0.1), x_pre),
            'window_drop': (lambda c=c: MaxViTTransformerBlock(
                c, 'window', 32, (8, 8), 0.1, 0.1, 0.1, 4.0), x),
            'window_nodrop': (lambda c=c: MaxViTTransformerBlock(
                c, 'window', 32, (8, 8), 0.0, 0.0, 0.0, 4.0), x),
            'grid_drop': (lambda c=c: MaxViTTransformerBlock(
                c, 'grid', 32, (8, 8), 0.1, 0.1, 0.1, 4.0), x),
            'grid_nodrop': (lambda c=c: MaxViTTransformerBlock(
                c, 'grid', 32, (8, 8), 0.0, 0.0, 0.0, 4.0), x),
        }
        for name, (make, inp) in cases.items():
            if name in recs:
                continue
            try:
                t_f, t_fb = probe_module(make, inp, rngs)
                recs[name] = {'fwd_ms': round(t_f * 1e3, 2),
                              'fwdbwd_ms': round(t_fb * 1e3, 2),
                              'bwd_ratio': round(t_fb / max(t_f, 1e-9), 2)}
            except Exception as e:
                recs[name] = {'error': repr(e)[:200]}
            print(key, name, json.dumps(recs[name]), flush=True)
            json.dump(results, open(args.out, 'w'), indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
