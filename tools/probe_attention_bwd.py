"""Probe: transformer-backward variants at STC x4/x5 shapes (real chip).

The train-step ablation (docs/data/train_ablation_b8.json) shows the
transformer block's backward running at 4.2x its forward (62.6 ms vs
14.8 ms at B=8 512^2) while plain convs sit at 1.43x. Hypotheses:

  1. The materialized (N, h, L, L) attention matrix (536 MB bf16 per x4
     layer) is saved as a residual and re-read several times by the
     softmax/einsum VJPs.
  2. The softmax backward's row reduction (sum(datt * att, axis=-1))
     runs in bf16 — the ~10x-slower bf16-native reduction path
     (docs/perf_analysis.md lane/reduction experiments).

Variants measured on one TransformerLayer-equivalent attention core at
the x4 shape (N=8, L=4096, C=512, heads=2) and x5 (L=1024):

  einsum      — current shipped path (bf16 softmax)
  f32softmax  — scores -> f32 softmax -> bf16 PV einsum
  remat       — jax.checkpoint over the attention core (recompute scores
                in bwd instead of saving them)
  remat_f32   — both
  flash       — pallas flash-attention kernel (never materializes L x L)

Usage: python tools/probe_attention_bwd.py
"""
from __future__ import annotations

import functools
import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)[:1, :1]))
    return (time.perf_counter() - t0) / iters * 1e3


def attention_core(q, k, v, mode):
    """(N, h, L, d) bf16 -> (N, h, L, d). The part the VJP differs on."""
    hd = q.shape[-1]

    def einsum_att(q, k, v):
        att = jnp.einsum('nhqd,nhkd->nhqk', q, k) / \
            jnp.sqrt(hd).astype(q.dtype)
        att = jax.nn.softmax(att, axis=-1)
        return jnp.einsum('nhqk,nhkd->nhqd', att, v)

    def f32_att(q, k, v):
        att = jnp.einsum('nhqd,nhkd->nhqk', q, k).astype(jnp.float32)
        att = jax.nn.softmax(att / math.sqrt(hd), axis=-1)
        return jnp.einsum('nhqk,nhkd->nhqd', att.astype(q.dtype), v)

    if mode == 'einsum':
        return einsum_att(q, k, v)
    if mode == 'f32softmax':
        return f32_att(q, k, v)
    if mode == 'remat':
        return jax.checkpoint(einsum_att)(q, k, v)
    if mode == 'remat_f32':
        return jax.checkpoint(f32_att)(q, k, v)
    if mode == 'flash':
        from jax.experimental.pallas.ops.tpu.flash_attention import \
            flash_attention
        out = flash_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32),
                              sm_scale=1.0 / math.sqrt(hd))
        return out.astype(q.dtype)
    raise ValueError(mode)


def run(n, length, c, heads, modes):
    rng = np.random.RandomState(0)
    hd = c // heads
    shape = (n, heads, length, hd)
    q = jnp.asarray(rng.randn(*shape) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(*shape) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(*shape) * 0.1, jnp.bfloat16)
    results = {}
    ref_grads = None
    for mode in modes:
        core = functools.partial(attention_core, mode=mode)

        fwd = jax.jit(lambda q, k, v: (core(q, k, v),))

        def loss(q, k, v):
            return jnp.sum(core(q, k, v).astype(jnp.float32) ** 2)

        vg = jax.jit(lambda q, k, v: jax.grad(loss, argnums=(0, 1, 2))(
            q, k, v))
        try:
            fwd_ms = _time(fwd, q, k, v)
            vg_ms = _time(vg, q, k, v)
            grads = vg(q, k, v)
            if ref_grads is None and mode == 'einsum':
                ref_grads = [np.asarray(g, np.float32) for g in grads]
            gerr = None
            if ref_grads is not None and mode != 'einsum':
                gerr = max(
                    float(np.max(np.abs(np.asarray(g, np.float32) - r)))
                    for g, r in zip(grads, ref_grads))
            results[mode] = dict(
                fwd_ms=round(fwd_ms, 2), fwd_plus_bwd_ms=round(vg_ms, 2),
                bwd_ms=round(vg_ms - fwd_ms, 2),
                bwd_over_fwd=round((vg_ms - fwd_ms) / fwd_ms, 2),
                max_grad_err_vs_einsum=gerr)
        except Exception as e:  # noqa: BLE001 — probe keeps going
            results[mode] = dict(error=f'{type(e).__name__}: {e}'[:200])
        print('PARTIAL', mode, json.dumps(results[mode]), flush=True)
    return results


def main():
    modes = ['einsum', 'f32softmax', 'remat', 'remat_f32', 'flash']
    out = {}
    out['x4_L4096'] = run(8, 4096, 512, 2, modes)
    out['x5_L1024'] = run(8, 1024, 512, 2, modes)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    sys.exit(main())
