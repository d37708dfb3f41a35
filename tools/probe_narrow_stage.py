"""Narrow-stage (64-ch 256²) repack probe (VERDICT r4 #6b).

The lane experiment showed 64-ch 3x3 convs sustain 48.7% of the 128-ch
per-FLOP rate (half the 128 MXU lanes idle). Two candidate repacks are
measured against the plain conv, value-checked for EXACT equivalence:

1. **space-to-depth**: pack 2x2 spatial phases into channels (64→256 ch
   at half resolution). The exact 3x3-equivalent packed kernel is a dense
   3x3 over 256 ch with structured zeros → 4.35x the FLOPs at ~2x the
   lane rate: predicted ~2x SLOWER before repack overhead. Measured to
   bury (or surprise).
2. **explicit channel zero-padding** 64→128: tests whether XLA's internal
   lane padding already gives the same wall time (it should — the idle
   lanes are a hardware property, not a lowering miss).

Writes docs/data/narrow_stage_probe.json.
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


def _time(fn, *args, iters=20):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32).astype(x.dtype)


def s2d(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def d2s(x, c):
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, c)


def packed_kernel(k: np.ndarray) -> np.ndarray:
    """Exact 3x3 s2d-equivalent kernel: dense (3,3,4C,4C) with structured
    zeros. Packed channel layout (ph, pw, c) = ph*2C + pw*C + c."""
    kh, kw, cin, cout = k.shape
    assert kh == kw == 3
    kp = np.zeros((3, 3, 4 * cin, 4 * cout), k.dtype)
    for po_i in range(2):
        for po_j in range(2):
            for u in range(3):
                for v in range(3):
                    r = po_i + u - 1
                    s = po_j + v - 1
                    du, ri = r // 2, r % 2
                    dv, rj = s // 2, s % 2
                    kp[du + 1, dv + 1,
                       (ri * 2 + rj) * cin:(ri * 2 + rj + 1) * cin,
                       (po_i * 2 + po_j) * cout:
                       (po_i * 2 + po_j + 1) * cout] += k[u, v]
    return kp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='docs/data/narrow_stage_probe.json')
    ap.add_argument('--batch', type=int, default=14)
    ap.add_argument('--hw', type=int, default=256)
    ap.add_argument('--c', type=int, default=64)
    args = ap.parse_args()
    n, hw, c = args.batch, args.hw, args.c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, hw, hw, c), jnp.bfloat16)
    k = rng.randn(3, 3, c, c).astype(np.float32) * 0.05
    kb = jnp.asarray(k, jnp.bfloat16)
    kp = jnp.asarray(packed_kernel(k), jnp.bfloat16)
    kpad = jnp.zeros((3, 3, 2 * c, 2 * c), jnp.bfloat16)
    kpad = kpad.at[:, :, :c, :c].set(kb)

    base = jax.jit(lambda a: _conv(a, kb))
    packed = jax.jit(lambda a: d2s(_conv(s2d(a), kp), c))
    packed_core = jax.jit(lambda ap_: _conv(ap_, kp))
    padded = jax.jit(lambda a: _conv(
        jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, c))), kpad)[..., :c])

    # exact-equivalence check (f32 accumulation both sides)
    y0 = np.asarray(base(x), np.float32)
    y1 = np.asarray(packed(x), np.float32)
    err = float(np.abs(y0 - y1).max())

    xp = s2d(x)
    rec = dict(
        geometry=f'B={n} {hw}^2 C={c} 3x3 bf16',
        equiv_abs_err=err,
        base_ms=round(_time(base, x), 3),
        s2d_packed_ms=round(_time(packed, x), 3),
        s2d_packed_conv_only_ms=round(_time(packed_core, xp), 3),
        chanpad128_ms=round(_time(padded, x), 3),
        flops_ratio_packed=round((hw // 2) ** 2 * 9 * (4 * c) ** 2 /
                                 (hw ** 2 * 9 * c * c), 2),
    )
    rec['verdict'] = (
        'packed wins' if rec['s2d_packed_ms'] < 0.95 * rec['base_ms']
        else 'buried: packed/pad do not beat the plain 64-ch conv')
    with open(args.out, 'w') as f:
        json.dump(rec, f, indent=1)
        f.write('\n')
    print(json.dumps(rec, indent=1))


if __name__ == '__main__':
    main()
