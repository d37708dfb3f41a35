"""CoordAtt gate-chain probe (VERDICT r4 #6a).

The perf doc attributes ~44 ms of the slide program to the CoordAtt gates
("bandwidth-bound by construction"). The MaxViT result proved such claims
must be buried by measurement, not argument. This probe, at the real
slide-tile decoder geometries (B=14 tiles of 256²):

1. times the XLA gate chain per Up stage (ca(x)*x + x),
2. inspects the compiled HLO: do the H-strip and W-strip mean reductions
   share ONE pass over x (multi-output fusion) or two?
3. times a Pallas single-pass dual-strip-pool kernel against XLA's pools
   (the only traffic a fused kernel can save: one full read of x when XLA
   does NOT fuse the two reductions),
4. writes docs/data/coordatt_probe.json with the verdict.

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
import re
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]))


def _time(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


# ----------------------------------------------------------------------
# XLA gate chain (exactly the model's math, unet_head.py CoordAtt)
# ----------------------------------------------------------------------

def _conv1x1(y, w):
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _gate_chain(x, w1, wh, ww):
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
    return a_w * a_h * x + x


def _pools_xla(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=2), jnp.sum(xf, axis=1)


# ----------------------------------------------------------------------
# Pallas single-pass dual strip pool
# ----------------------------------------------------------------------

def _dual_pool_kernel(x_ref, oh_ref, ow_ref):
    hi = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)        # (1, bh, W, C)
    oh_ref[...] = jnp.sum(x, axis=2)          # (1, bh, C)

    @pl.when(hi == 0)
    def _init():
        ow_ref[...] = jnp.zeros_like(ow_ref)
    ow_ref[...] += jnp.sum(x, axis=1)         # (1, W, C)


def _pools_pallas(x, bh):
    n, h, w, c = x.shape
    return pl.pallas_call(
        _dual_pool_kernel,
        grid=(n, h // bh),
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, bh, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, w, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, c), jnp.float32),
            jax.ShapeDtypeStruct((n, w, c), jnp.float32),
        ],
    )(x)


def _reduce_fusion_passes(hlo: str) -> int:
    """Count compiled fusions whose operands include the full-size x and
    whose body reduces — 1 means the two strip pools share one pass."""
    n = 0
    for m in re.finditer(r'fusion(\.\d+)?[^\n]*kind=kInput[^\n]*'
                         r'calls=([%\w.-]+)', hlo):
        body = m.group(2).strip('%')
        sec = hlo.split(f'{body} ', 1)
        if len(sec) > 1 and 'reduce(' in sec[1][:4000]:
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='docs/data/coordatt_probe.json')
    ap.add_argument('--batch', type=int, default=14)
    args = ap.parse_args()

    rec = {'protocol': 'B=14 256^2-crop slide-tile decoder geometries, '
                       'bf16 x, one-readback timing', 'stages': []}
    rng = np.random.RandomState(0)
    tot = dict(chain=0.0, pools_xla=0.0, pools_pl=0.0)
    for (hw, c) in ((32, 1024), (64, 512), (128, 256), (256, 128)):
        x = jnp.asarray(rng.rand(args.batch, hw, hw, c), jnp.bfloat16)
        mip = max(8, c // 4)
        w1 = jnp.asarray(rng.randn(1, 1, c, mip) * 0.05, jnp.bfloat16)
        wh = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)
        ww = jnp.asarray(rng.randn(1, 1, mip, c) * 0.05, jnp.bfloat16)

        chain = jax.jit(_gate_chain)
        ms_chain = _time(chain, x, w1, wh, ww)
        hlo = chain.lower(x, w1, wh, ww).compile().as_text()
        reduce_passes = _reduce_fusion_passes(hlo)

        pools_x = jax.jit(_pools_xla)
        ms_pools_xla = _time(pools_x, x)
        bh = min(8, hw)
        pools_p = jax.jit(functools.partial(_pools_pallas, bh=bh))
        ms_pools_pl = _time(pools_p, x)
        eh, ew = pools_x(x)
        ph, pw = pools_p(x)
        dh = float(jnp.max(jnp.abs(eh - ph)))
        dw = float(jnp.max(jnp.abs(ew - pw)))
        rec['stages'].append(dict(
            hw=hw, c=c, gate_chain_ms=round(ms_chain, 3),
            pools_xla_ms=round(ms_pools_xla, 3),
            pools_pallas_ms=round(ms_pools_pl, 3),
            pools_abs_err=[dh, dw],
            hlo_reduce_passes_over_x=reduce_passes))
        tot['chain'] += ms_chain
        tot['pools_xla'] += ms_pools_xla
        tot['pools_pl'] += ms_pools_pl
        print(f'hw={hw} c={c}: chain {ms_chain:.2f} ms '
              f'({reduce_passes} reduce passes), pools XLA '
              f'{ms_pools_xla:.2f} vs pallas {ms_pools_pl:.2f} ms '
              f'(err {dh:.2e}/{dw:.2e})', flush=True)
    rec['total_gate_chain_ms'] = round(tot['chain'], 2)
    rec['total_pools_xla_ms'] = round(tot['pools_xla'], 2)
    rec['total_pools_pallas_ms'] = round(tot['pools_pl'], 2)
    rec['pools_speedup'] = round(tot['pools_xla'] /
                                 max(tot['pools_pl'], 1e-9), 3)
    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=1)
        f.write('\n')
    print(json.dumps({k: v for k, v in rec.items() if k != 'stages'}))


if __name__ == '__main__':
    main()
