"""Fused-vs-XLA CoordAtt chain probe (round 5, perf).

Times the model's EXACT gate chain (additive quirk: out = a_w*a_h + x,
reference ``unet_head.py:56``/``:146``) against the fused Pallas pair
(``ops/coordatt_fused.py``) at the real slide-tile geometry (B=126
concat tensors). Also times the custom-VJP backward of both.

Writes docs/data/coordatt_fused_probe.json.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from probe_coordatt import _conv1x1


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


def _tiny(x_h, x_w_t, w1, wh, ww, dtype):
    """Pooled strips -> bottleneck -> per-axis sigmoid gates (3-D)."""
    from stc_unet_tpu.models.bricks import h_swish
    y = jnp.concatenate([x_h, x_w_t], axis=1)[:, :, None, :]
    y = h_swish(_conv1x1(y, w1))
    h = x_h.shape[1]
    a_h = jax.nn.sigmoid(_conv1x1(y[:, :h], wh))[:, :, 0, :]
    a_w = jax.nn.sigmoid(_conv1x1(y[:, h:], ww))[:, :, 0, :]
    return a_h, a_w


def chain_model(x, w1, wh, ww):
    """The model's current XLA chain, verbatim semantics."""
    from stc_unet_tpu.models.bricks import h_swish
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    x_h = jnp.mean(xf, axis=2, keepdims=True).astype(x.dtype)
    x_w = jnp.mean(xf, axis=1, keepdims=True).astype(x.dtype)
    x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))
    y = jnp.concatenate([x_h, x_w_t], axis=1)
    y = h_swish(_conv1x1(y, w1))
    y_h, y_w = y[:, :h], y[:, h:]
    y_w = jnp.transpose(y_w, (0, 2, 1, 3))
    a_h = jax.nn.sigmoid(_conv1x1(y_h, wh))
    a_w = jax.nn.sigmoid(_conv1x1(y_w, ww))
    return a_w * a_h + x


def chain_fused(x, w1, wh, ww):
    from stc_unet_tpu.ops.coordatt_fused import gate_add, strip_pools
    n, h, w, c = x.shape
    sh, sw = strip_pools(x)
    x_h = (sh / w).astype(x.dtype)
    x_w_t = (sw / h).astype(x.dtype)
    a_h, a_w = _tiny(x_h, x_w_t, w1, wh, ww, x.dtype)
    return gate_add(x, a_h, a_w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='docs/data/coordatt_fused_probe.json')
    ap.add_argument('--batch', type=int, default=126)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--bwd', action='store_true')
    args = ap.parse_args()

    rec = {'protocol': f'B={args.batch} decoder concat geometries, bf16, '
                       'one-readback timing; fused=ops/coordatt_fused.py',
           'stages': []}
    rng = np.random.RandomState(0)
    tot = dict(model=0.0, fused=0.0, model_bwd=0.0, fused_bwd=0.0)
    for (hw, c) in ((32, 1024), (64, 512), (128, 256), (256, 128)):
        x = jnp.asarray(rng.rand(args.batch, hw, hw, c), jnp.bfloat16)
        mip = max(8, c // 4)
        w1 = jnp.asarray(rng.randn(1, 1, c, mip) * 0.05, jnp.bfloat16)
        wh = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)
        ww = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)

        fm = jax.jit(chain_model)
        ff = jax.jit(chain_fused)
        ms_m = _time(fm, x, w1, wh, ww, iters=args.iters)
        ms_f = _time(ff, x, w1, wh, ww, iters=args.iters)
        err = float(jnp.max(jnp.abs(
            (fm(x, w1, wh, ww) - ff(x, w1, wh, ww)).astype(jnp.float32))))

        stage = dict(hw=hw, c=c, model_ms=round(ms_m, 3),
                     fused_ms=round(ms_f, 3), abs_err=err)

        if args.bwd:
            def loss_m(x, w1, wh, ww):
                return jnp.sum(chain_model(x, w1, wh, ww)
                               .astype(jnp.float32))

            def loss_f(x, w1, wh, ww):
                return jnp.sum(chain_fused(x, w1, wh, ww)
                               .astype(jnp.float32))
            gm = jax.jit(jax.grad(loss_m, argnums=(0, 1, 2, 3)))
            gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))
            ms_gm = _time(gm, x, w1, wh, ww, iters=args.iters)
            ms_gf = _time(gf, x, w1, wh, ww, iters=args.iters)
            dm, df = gm(x, w1, wh, ww), gf(x, w1, wh, ww)
            gerr = max(float(jnp.max(jnp.abs((a - b).astype(jnp.float32))))
                       for a, b in zip(dm, df))
            stage.update(model_bwd_ms=round(ms_gm, 3),
                         fused_bwd_ms=round(ms_gf, 3), grad_abs_err=gerr)
            tot['model_bwd'] += ms_gm
            tot['fused_bwd'] += ms_gf

        rec['stages'].append(stage)
        tot['model'] += ms_m
        tot['fused'] += ms_f
        print(f'hw={hw} c={c}: model {ms_m:.2f} fused {ms_f:.2f} '
              f'(err {err:.2e})' +
              (f' | bwd {stage["model_bwd_ms"]:.2f} vs '
               f'{stage["fused_bwd_ms"]:.2f} (gerr {gerr:.2e})'
               if args.bwd else ''), flush=True)

    for k, v in tot.items():
        rec[f'total_{k}_ms'] = round(v, 2)
    rec['speedup'] = round(tot['model'] / max(tot['fused'], 1e-9), 3)
    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=1)
        f.write('\n')
    print(json.dumps({k: v for k, v in rec.items() if k != 'stages'}))


if __name__ == '__main__':
    main()
