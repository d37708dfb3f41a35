"""Probe: DCBlock dual-chain conv merging (exact math) at train geometry.

docs/data/dc_bwd_probe.json shows DC-UNet's convs are lane-padding bound
(51ch == 64ch == 128ch in wall time) — so running the a-chain and b-chain
as SEPARATE convs doubles the number of lane-bound passes for free. The
two chains are mergeable exactly:

    a3 = conv3(x, Wa), b3 = conv3(x, Wb)      == conv3(x, [Wa|Wb])  (split)
    a5 = conv3(a3),    b5 = conv3(b3)         == grouped conv3([a3|b3]), g=2
    (same for the 7-level), and each merged conv pays ONE reflect pad.

This measures the shipped DCBlock vs the merged formulation (functional,
conv+relu only — BN excluded on both sides for apples-to-apples) fwd and
fwd+bwd at the two dominant geometries.

Output: docs/data/dc_merge_probe.json
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WARMUP, ITERS = 2, 10
B = 8


def time_queued(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]
                  .astype(jnp.float32)))
    return round((time.perf_counter() - t0) / ITERS * 1e3, 2)


def rpad(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='reflect')


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups)


def dcblock_split(x, ws):
    """Shipped structure: 7 convs, 6 reflect pads (BN omitted)."""
    sc = conv(x, ws['sc'])  # 1x1, no pad
    a3 = jax.nn.relu(conv(rpad(x), ws['a3']))
    a5 = jax.nn.relu(conv(rpad(a3), ws['a5']))
    a7 = jax.nn.relu(conv(rpad(a5), ws['a7']))
    b3 = jax.nn.relu(conv(rpad(x), ws['b3']))
    b5 = jax.nn.relu(conv(rpad(b3), ws['b5']))
    b7 = jax.nn.relu(conv(rpad(b5), ws['b7']))
    out = jnp.concatenate([a3, a5, a7], -1)
    out2 = jnp.concatenate([b3, b5, b7], -1)
    return jax.nn.relu(sc + out + out2)


def dcblock_merged(x, ws):
    """Merged: 4 convs, 3 reflect pads; identical math."""
    c3 = ws['a3'].shape[-1]
    c5 = ws['a5'].shape[-1]
    sc = conv(x, ws['sc'])
    m3 = jax.nn.relu(conv(rpad(x), jnp.concatenate([ws['a3'], ws['b3']],
                                                   axis=-1)))
    a3, b3 = m3[..., :c3], m3[..., c3:]
    # grouped: kernel (3,3,c3, 2*c5), block-diag == two separate convs
    w5 = jnp.concatenate([ws['a5'], ws['b5']], axis=-1)
    m5 = jax.nn.relu(conv(rpad(m3), w5, groups=2))
    a5, b5 = m5[..., :c5], m5[..., c5:]
    w7 = jnp.concatenate([ws['a7'], ws['b7']], axis=-1)
    m7 = jax.nn.relu(conv(rpad(m5), w7, groups=2))
    c7 = ws['a7'].shape[-1]
    a7, b7 = m7[..., :c7], m7[..., c7:]
    out = jnp.concatenate([a3, a5, a7], -1)
    out2 = jnp.concatenate([b3, b5, b7], -1)
    return jax.nn.relu(sc + out + out2)


def run(size, u, cin):
    w = 1.67 * u
    c3, c5, c7 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
    oc = c3 + c5 + c7
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, size, size, cin) * 0.1, jnp.bfloat16)
    ws = {
        'sc': jnp.asarray(rng.randn(1, 1, cin, oc) * 0.1, jnp.float32),
        'a3': jnp.asarray(rng.randn(3, 3, cin, c3) * 0.1, jnp.float32),
        'b3': jnp.asarray(rng.randn(3, 3, cin, c3) * 0.1, jnp.float32),
        'a5': jnp.asarray(rng.randn(3, 3, c3, c5) * 0.1, jnp.float32),
        'b5': jnp.asarray(rng.randn(3, 3, c3, c5) * 0.1, jnp.float32),
        'a7': jnp.asarray(rng.randn(3, 3, c5, c7) * 0.1, jnp.float32),
        'b7': jnp.asarray(rng.randn(3, 3, c5, c7) * 0.1, jnp.float32),
    }
    rec = {}
    outs = {}
    for name, f in (('split', dcblock_split), ('merged', dcblock_merged)):
        fwd = jax.jit(f)

        def loss(ws, x, f=f):
            return jnp.sum(f(x, ws).astype(jnp.float32) ** 2)

        vg = jax.jit(jax.grad(loss))
        rec[name] = {'fwd_ms': time_queued(fwd, x, ws),
                     'fwdbwd_ms': time_queued(vg, ws, x)}
        outs[name] = np.asarray(fwd(x, ws), np.float32)
    rec['max_out_diff'] = float(
        np.abs(outs['split'] - outs['merged']).max())
    rec['speedup_fwd'] = round(rec['split']['fwd_ms'] /
                               rec['merged']['fwd_ms'], 2)
    rec['speedup_fwdbwd'] = round(rec['split']['fwdbwd_ms'] /
                                  rec['merged']['fwdbwd_ms'], 2)
    return rec


def main():
    out = {}
    for size, u, cin in ((512, 32, 3), (512, 32, 59), (256, 64, 51),
                         (128, 128, 105)):
        key = f'{size}x{size}_u{u}_cin{cin}'
        out[key] = run(size, u, cin)
        print(key, json.dumps(out[key]), flush=True)
    path = _osp.join(_repo_root, 'docs', 'data', 'dc_merge_probe.json')
    json.dump(out, open(path, 'w'), indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()
