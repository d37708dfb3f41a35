"""DC-UNet backward attribution probe (VERDICT r3 #1, DC-UNet branch).

DC-UNet trains at ~12 img/s vs whole-mode 57.9 (ratio 4.8x) and selective
remat ('hires', 12.2) barely beats full-block remat (11.98) — so recompute
is NOT the cost; the backward itself is. This probe attributes it:

1. per-stage DCBlock fwd vs fwd+bwd (the ratio per geometry),
2. the same 3x3 conv at 512^2/B=8 with DC-UNet's odd widths (51ch) vs
   lane-aligned 64/128ch — if times match, the arithmetic is lane-padding
   bound and the odd widths set the ceiling,
3. reflect-pad (DC-UNet's Conv2dSame) vs zero-pad conv, fwd+bwd — is the
   reflect VJP's slice+edge-accumulate a factor?

Output: docs/data/dc_bwd_probe.json
Usage: python tools/probe_dc_bwd.py
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import json
import time

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


def bench_module(mod, x_shape, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    x = jnp.asarray(rng.randn(*x_shape), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def fwd(v, x):
        return mod.apply(v, x, train=True,
                         mutable=['batch_stats'])[0]

    @jax.jit
    def fwdbwd(v, x):
        def loss(v, x):
            out, _ = mod.apply(v, x, train=True, mutable=['batch_stats'])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(v, x)

    f = time_queued(fwd, variables, x)
    fb = time_queued(fwdbwd, variables, x)
    return {'fwd_ms': f, 'fwdbwd_ms': fb,
            'bwd_ratio': round((fb - f) / max(f, 1e-6), 2)}


def bench_conv(cin, cout, size, pad_mode):
    import flax.linen as nn

    class C(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            if pad_mode == 'reflect':
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                            mode='reflect')
                return nn.Conv(cout, (3, 3), padding='VALID',
                               use_bias=False, dtype=x.dtype)(x)
            return nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                           dtype=x.dtype)(x)

    return bench_module(C(), (B, size, size, cin))


def main():
    from stc_unet_tpu.models.decode_heads.dc_unet_head import DCBlock
    out = {}

    # 1) per-stage DCBlock (encoder path geometries, nf=32 config)
    stages = [(512, 32, 3), (256, 64, 51), (128, 128, 105),
              (64, 256, 213), (32, 512, 427)]
    for size, u, cin in stages:
        key = f'dcblock_{size}x{size}_u{u}'
        out[key] = bench_module(DCBlock(u=u), (B, size, size, cin))
        print(key, json.dumps(out[key]), flush=True)

    # 2) lane-padding: same conv FLOP-scaled widths at 512^2
    for cin, cout in ((51, 51), (64, 64), (128, 128)):
        key = f'conv3x3_512_{cin}to{cout}_zero'
        out[key] = bench_conv(cin, cout, 512, 'zero')
        print(key, json.dumps(out[key]), flush=True)

    # 3) reflect vs zero pad at the dominant geometry
    for mode in ('reflect', 'zero'):
        key = f'conv3x3_512_51to51_{mode}'
        out[key] = bench_conv(51, 51, 512, mode)
        print(key, json.dumps(out[key]), flush=True)

    path = _osp.join(_repo_root, 'docs', 'data', 'dc_bwd_probe.json')
    json.dump(out, open(path, 'w'), indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()
