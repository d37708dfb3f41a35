"""CoordAtt gate-chain probe, round 5 — corrected protocol.

Round 4's `probe_coordatt.py` measured the gate chains at B=14 and
concluded they cost 7.7 ms total, leaving a "~35 ms program-level
mystery" vs the 43 ms ablation delta. That protocol was wrong: the slide
program runs the net on the FULL tile batch (9 windows x 14 images =
126 tiles of 256², `encoder_decoder.py:_jit_slide`), so the decoder's
CoordAtt gates see B=126 tensors (~4 GB across the four Up stages), 9x
what the probe timed.

This probe re-measures at the real geometry and decomposes the chain:

  pools       the two f32-accumulated strip means (1 read of x floor)
  tiny        bottleneck 1x1 convs + sigmoids on the pooled strips
  apply       x * (1 + a_h*a_w)   (1 read + 1 write of x floor)
  chain       the full gate as the model computes it
  chain_v2    variant: per-reduce dtype=f32 means (no shared xf cast —
              if XLA materializes the shared f32 cast, this dodges it)
  chain_pl    pools via the Pallas dual-strip kernel + XLA tiny/apply

Floor = 3 HBM passes of x (~14.5 ms at 819 GB/s for the 4 stages at
B=126). If `chain` >> floor but the parts sum to floor, the cost is a
fusion/materialization artifact and the model should switch to the
winning variant.

Timing protocol: N queued calls bounded by one host readback
(CLAUDE.md axon rules).
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from probe_coordatt import (_conv1x1, _dual_pool_kernel,  # noqa: F401
                            _pools_pallas, _reduce_fusion_passes)


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


def _gate_small(x, w1, wh, ww):
    """Pools -> bottleneck -> per-axis sigmoid gates (small outputs)."""
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
    return a_h, a_w


def _chain(x, w1, wh, ww):
    a_h, a_w = _gate_small(x, w1, wh, ww)
    return a_w * a_h * x + x


def _gate_small_v2(x, w1, wh, ww):
    """No shared xf cast: each mean converts in its own reduce."""
    from stc_unet_tpu.models.bricks import h_swish
    n, h, w, c = x.shape
    x_h = jnp.mean(x, axis=2, keepdims=True,
                   dtype=jnp.float32).astype(x.dtype)
    x_w = jnp.mean(x, axis=1, keepdims=True,
                   dtype=jnp.float32).astype(x.dtype)
    x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))
    y = jnp.concatenate([x_h, x_w_t], axis=1)
    y = h_swish(_conv1x1(y, w1))
    y_h, y_w = y[:, :h], y[:, h:]
    y_w = jnp.transpose(y_w, (0, 2, 1, 3))
    a_h = jax.nn.sigmoid(_conv1x1(y_h, wh))
    a_w = jax.nn.sigmoid(_conv1x1(y_w, ww))
    return a_h, a_w


def _chain_v2(x, w1, wh, ww):
    a_h, a_w = _gate_small_v2(x, w1, wh, ww)
    return a_w * a_h * x + x


def _apply_only(x, a_h, a_w):
    return a_w * a_h * x + x


def _chain_pl(x, w1, wh, ww, bh):
    from stc_unet_tpu.models.bricks import h_swish
    n, h, w, c = x.shape
    sh, sw = _pools_pallas(x, bh)                    # (N,H,C),(N,W,C) f32
    x_h = (sh / w).astype(x.dtype)[:, :, None, :]    # (N,H,1,C)
    x_w_t = (sw / h).astype(x.dtype)[:, :, None, :]  # (N,W,1,C)
    y = jnp.concatenate([x_h, x_w_t], axis=1)
    y = h_swish(_conv1x1(y, w1))
    y_h, y_w = y[:, :h], y[:, h:]
    y_w = jnp.transpose(y_w, (0, 2, 1, 3))
    a_h = jax.nn.sigmoid(_conv1x1(y_h, wh))
    a_w = jax.nn.sigmoid(_conv1x1(y_w, ww))
    return a_w * a_h * x + x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='docs/data/coordatt_probe2.json')
    ap.add_argument('--batch', type=int, default=126)
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    rec = {'protocol': f'B={args.batch} (full slide tile batch) decoder '
                       'concat geometries, bf16 x, one-readback timing',
           'stages': []}
    rng = np.random.RandomState(0)
    keys = ('pools', 'tiny_chain', 'apply', 'chain', 'chain_v2', 'chain_pl')
    tot = dict.fromkeys(keys + ('floor',), 0.0)
    for (hw, c) in ((32, 1024), (64, 512), (128, 256), (256, 128)):
        x = jnp.asarray(rng.rand(args.batch, hw, hw, c), jnp.bfloat16)
        mip = max(8, c // 4)
        w1 = jnp.asarray(rng.randn(1, 1, c, mip) * 0.05, jnp.bfloat16)
        wh = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)
        ww = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)

        gbytes = x.size * 2 / 1e9
        floor_ms = 3 * gbytes / 819 * 1e3

        def _pools(x):
            xf = x.astype(jnp.float32)
            return (jnp.mean(xf, axis=2, keepdims=True),
                    jnp.mean(xf, axis=1, keepdims=True))

        ms = {}
        ms['pools'] = _time(jax.jit(_pools), x, iters=args.iters)
        ms['tiny_chain'] = _time(jax.jit(_gate_small), x, w1, wh, ww,
                                 iters=args.iters)
        a_h, a_w = jax.jit(_gate_small)(x, w1, wh, ww)
        ms['apply'] = _time(jax.jit(_apply_only), x, a_h, a_w,
                            iters=args.iters)
        chain = jax.jit(_chain)
        ms['chain'] = _time(chain, x, w1, wh, ww, iters=args.iters)
        ms['chain_v2'] = _time(jax.jit(_chain_v2), x, w1, wh, ww,
                               iters=args.iters)
        bh = min(8, hw)
        ms['chain_pl'] = _time(
            jax.jit(functools.partial(_chain_pl, bh=bh)), x, w1, wh, ww,
            iters=args.iters)
        # numerics: variants vs the model chain
        ref = chain(x, w1, wh, ww)
        d2 = float(jnp.max(jnp.abs(
            (jax.jit(_chain_v2)(x, w1, wh, ww) - ref).astype(jnp.float32))))
        dp = float(jnp.max(jnp.abs(
            (jax.jit(functools.partial(_chain_pl, bh=bh))(x, w1, wh, ww)
             - ref).astype(jnp.float32))))

        stage = dict(hw=hw, c=c, floor_ms=round(floor_ms, 2),
                     err_v2=d2, err_pl=dp,
                     **{k: round(v, 3) for k, v in ms.items()})
        rec['stages'].append(stage)
        for k in keys:
            tot[k] += ms[k]
        tot['floor'] += floor_ms
        print(f'hw={hw} c={c}: floor {floor_ms:.1f} | ' +
              ' '.join(f'{k} {ms[k]:.2f}' for k in keys) +
              f' | err v2 {d2:.1e} pl {dp:.1e}', flush=True)

    for k in list(tot):
        rec[f'total_{k}_ms'] = round(tot[k], 2)
    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=1)
        f.write('\n')
    print(json.dumps({k: v for k, v in rec.items() if k != 'stages'}))


if __name__ == '__main__':
    main()
