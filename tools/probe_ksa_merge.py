"""Probe: merged KSA branch convs vs three separate convs (real chip).

The 64-channel stage-1 KSA branches (3x3/5x5/7x7, 64->64 each) run at the
half-idle 128-lane MXU floor (see docs/perf_analysis.md lane experiment).
Zero-padding the 3x3/5x5 kernels to 7x7 and concatenating along OUT
channels yields ONE 64->192 conv — identical math (zero taps read border
pixels times zero weights), 1.77x the FLOPs ((49*3)/(9+25+49)), but full
MXU lanes. This probe measures whether the trade wins at the shapes that
matter (slide tiles 126x256^2 and train whole 8x512^2).

Usage: python tools/probe_ksa_merge.py
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def run(n, hw, c, kernels=(3, 5, 7)):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, hw, hw, c), jnp.bfloat16)
    ws = [jnp.asarray(rng.rand(k, k, c, c) * 0.01, jnp.bfloat16)
          for k in kernels]
    kmax = max(kernels)

    @jax.jit
    def separate(x, *ws):
        return jnp.concatenate([conv(x, w) for w in ws], axis=-1)

    @jax.jit
    def merged(x, *ws):
        padded = []
        for w in ws:
            p = (kmax - w.shape[0]) // 2
            padded.append(jnp.pad(w, ((p, p), (p, p), (0, 0), (0, 0))))
        return conv(x, jnp.concatenate(padded, axis=-1))

    sep_ms = _time(separate, x, *ws)
    mer_ms = _time(merged, x, *ws)
    # numerics check (zero-padded kernel == smaller kernel conv)
    a = np.asarray(separate(x[:2], *ws), np.float32)
    b = np.asarray(merged(x[:2], *ws), np.float32)
    err = float(np.max(np.abs(a - b)))
    flops_sep = 2 * n * hw * hw * c * c * sum(k * k for k in kernels)
    flops_mer = 2 * n * hw * hw * c * c * kmax * kmax * len(kernels)
    return dict(
        shape=f'{n}x{hw}^2x{c}', sep_ms=round(sep_ms, 2),
        merged_ms=round(mer_ms, 2),
        speedup=round(sep_ms / mer_ms, 3), max_abs_err=err,
        sep_tflops=round(flops_sep / sep_ms / 1e9, 1),
        merged_tflops=round(flops_mer / mer_ms / 1e9, 1))


def main():
    out = {}
    # stage-1 shapes: slide tile batch and train whole-mode
    out['slide_s1_c64'] = run(126, 256, 64)
    out['train_s1_c64'] = run(8, 512, 64)
    # stage-2 128ch control (lanes already full -> merge should LOSE)
    out['slide_s2_c128'] = run(126, 128, 128)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    sys.exit(main())
