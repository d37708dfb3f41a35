"""On-chip validation + timing of the fused Pallas window-attention kernel
vs the plain-XLA einsum path, at the real MaxViT-UNet train geometries
(512^2 input, B=8, num_heads=32, 8x8 windows).

Checks (recorded to docs/data/fused_attn_probe.json):
- fwd parity vs einsum (bf16 tolerance)
- grad parity (dq/dk/dv/dbias) vs einsum autodiff
- dropout: same seed -> identical out; different seed -> different;
  bwd mask == fwd mask (directional finite difference)
- timing: fwd and fwd+bwd for fused vs einsum, per stage, drop on/off

Usage: python tools/probe_fused_attention.py [--stages 0 1 2 3]
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

from stc_unet_tpu.ops.window_attention import (window_attention,
                                               window_attention_reference)

WARMUP = 2
ITERS = 10

# (windows at B=8, C) per stage: W = 8 * (HW / 64)
STAGES = [(2048, 64), (512, 128), (128, 256), (32, 512)]
N, HEADS = 64, 32


def time_queued(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    float(jnp.sum(jax.tree_util.tree_leaves(outs[-1])[0]
                  .astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stages', nargs='*', type=int, default=[0, 1, 2, 3])
    ap.add_argument('--out', default=_osp.join(
        _repo_root, 'docs', 'data', 'fused_attn_probe.json'))
    args = ap.parse_args()

    results = {}
    if _osp.exists(args.out):
        results = json.load(open(args.out))
    scale = HEADS ** -0.5

    for si in args.stages:
        w, c = STAGES[si]
        key = f'stage{si}_w{w}_c{c}'
        rec = results.setdefault(key, {})
        rng = np.random.RandomState(si)
        q = jnp.asarray(rng.randn(w, N, c), jnp.bfloat16)
        k = jnp.asarray(rng.randn(w, N, c), jnp.bfloat16)
        v = jnp.asarray(rng.randn(w, N, c), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(HEADS, N, N) * 0.1, jnp.float32)
        bias_e = bias.transpose(1, 0, 2).reshape(N, HEADS * N)
        seed = jnp.asarray([42], jnp.int32)

        fused = jax.jit(lambda q, k, v, be: window_attention(
            q, k, v, be, seed, HEADS, scale, 0.0, False))
        ref = jax.jit(lambda q, k, v, b: window_attention_reference(
            q, k, v, b.astype(jnp.bfloat16), HEADS, scale))

        o_f = np.asarray(fused(q, k, v, bias_e), np.float32)
        o_r = np.asarray(ref(q, k, v, bias), np.float32)
        err = float(np.max(np.abs(o_f - o_r)) /
                    max(np.max(np.abs(o_r)), 1e-6))
        rec['fwd_rel_err'] = round(err, 5)

        # grads
        def loss_fused(q, k, v, be):
            o = window_attention(q, k, v, be, seed, HEADS, scale, 0.0,
                                 False)
            return jnp.sum((o * o).astype(jnp.float32))

        def loss_ref(q, k, v, b):
            o = window_attention_reference(q, k, v,
                                           b.astype(jnp.bfloat16), HEADS,
                                           scale)
            return jnp.sum((o * o).astype(jnp.float32))

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(
            q, k, v, bias_e)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, k, v,
                                                               bias)
        gerrs = {}
        for a, b, name in zip(gf[:3], gr[:3], 'qkv'):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            gerrs['d' + name] = round(
                float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)),
                                                  1e-6)), 5)
        db_f = np.asarray(gf[3], np.float32).reshape(N, HEADS, N)\
            .transpose(1, 0, 2)
        db_r = np.asarray(gr[3], np.float32)
        gerrs['dbias'] = round(
            float(np.max(np.abs(db_f - db_r)) /
                  max(np.max(np.abs(db_r)), 1e-6)), 5)
        rec['grad_rel_err'] = gerrs

        # dropout behaviour
        dfused = jax.jit(lambda q, k, v, be, s: window_attention(
            q, k, v, be, s, HEADS, scale, 0.1, False))
        d1 = np.asarray(dfused(q, k, v, bias_e, seed), np.float32)
        d2 = np.asarray(dfused(q, k, v, bias_e, seed), np.float32)
        d3 = np.asarray(dfused(q, k, v, bias_e,
                               jnp.asarray([7], jnp.int32)), np.float32)
        rec['drop_deterministic'] = bool((d1 == d2).all())
        rec['drop_seed_sensitive'] = bool(not np.allclose(d1, d3))

        def loss_drop(v):
            o = window_attention(q, k, v, bias_e, seed, HEADS, scale, 0.1,
                                 False)
            return jnp.sum(o.astype(jnp.float32))

        g = jax.jit(jax.grad(loss_drop))(v)
        dv = jnp.asarray(rng.randn(*v.shape), jnp.bfloat16)
        eps = 0.05
        fd = (float(loss_drop(v + eps * dv)) -
              float(loss_drop(v - eps * dv))) / (2 * eps)
        gdot = float(jnp.vdot(g.astype(jnp.float32),
                              dv.astype(jnp.float32)))
        rec['drop_bwd_fd_rel_err'] = round(abs(gdot - fd) /
                                           max(abs(fd), 1e-6), 4)

        # timing
        rec['fwd_ms'] = {'fused': round(time_queued(fused, q, k, v,
                                                    bias_e), 2),
                         'xla': round(time_queued(ref, q, k, v, bias), 2)}
        fb_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))
        fb_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))
        rec['fwdbwd_ms'] = {'fused': round(time_queued(fb_f, q, k, v,
                                                       bias_e), 2),
                            'xla': round(time_queued(fb_r, q, k, v,
                                                     bias), 2)}
        dloss_f = jax.jit(jax.grad(lambda q, k, v, be, s: jnp.sum(
            window_attention(q, k, v, be, s, HEADS, scale, 0.1, False)
            .astype(jnp.float32)), argnums=(0, 1, 2)))
        rec['fwdbwd_drop_ms'] = {
            'fused': round(time_queued(dloss_f, q, k, v, bias_e, seed), 2)}
        print(key, json.dumps(rec), flush=True)
        json.dump(results, open(args.out, 'w'), indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
