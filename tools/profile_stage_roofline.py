"""Per-stage conv roofline probe (VERDICT r2 item 2).

Times each STC-UNet conv stage standalone at slide geometry (126 tiles of
256², bf16) and runs the decisive lane-limit experiment: a 64-channel 3×3
conv vs the same images with channels zero-padded to 128. If the 64-ch
conv costs the SAME wall time as the 128-ch one, the ≤64-ch stages are
lane-limited (half the MXU's 128 lanes idle) and their achieved TFLOP/s
is capped at ~50%; if it costs ~half, the lane-floor explanation in
docs/perf_analysis.md is wrong and the ~70-75 slices/s bound stands.

Usage: python tools/profile_stage_roofline.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def conv_probe(n, hw, cin, cout, k=3, iters=10):
    """One 3x3 conv at (n, hw, hw, cin)->cout bf16; returns (ms, tflops)."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(n, hw, hw, cin), jnp.bfloat16)
    w = jnp.asarray(rs.rand(k, k, cin, cout) * 0.1, jnp.bfloat16)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    dt = time_fn(f, x, w, iters=iters)
    flops = 2 * n * hw * hw * cin * cout * k * k
    return dt * 1e3, flops / dt / 1e12


def bwd_conv_probe(n, hw, cin, cout, k=3, iters=10, wrt='both'):
    """Backward pass of the same conv: grad wrt input, filter, or both.

    FLOPs: grad-input and grad-filter are each one conv-sized contraction
    (2*n*hw²*cin*cout*k² MACs·2), so 'both' counts 2× the forward FLOPs.
    """
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(n, hw, hw, cin), jnp.bfloat16)
    w = jnp.asarray(rs.rand(k, k, cin, cout) * 0.1, jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    if wrt == 'input':
        f = jax.jit(lambda x, w: jax.grad(
            lambda x: jnp.sum(conv(x, w).astype(jnp.float32)))(x))
        mult = 1
    elif wrt == 'filter':
        f = jax.jit(lambda x, w: jax.grad(
            lambda w: jnp.sum(conv(x, w).astype(jnp.float32)))(w))
        mult = 1
    else:
        def both(x, w):
            gx, gw = jax.grad(
                lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32)),
                argnums=(0, 1))(x, w)
            # one scalar per output so the timing readback stays tiny
            return jnp.sum(gx.astype(jnp.float32)) + \
                jnp.sum(gw.astype(jnp.float32))
        f = jax.jit(both)
        mult = 2
    dt = time_fn(f, x, w, iters=iters)
    flops = mult * 2 * n * hw * hw * cin * cout * k * k
    return dt * 1e3, flops / dt / 1e12


def main():
    out = {}

    if '--bwd' in sys.argv:
        # Backward lane experiment (round 3, train-step evidence): does the
        # 64-ch lane floor apply to the conv backward too, and at what rate
        # do grad-input / grad-filter run relative to forward?
        n, hw = 8, 512  # the train step's stem geometry (B=8 512²)
        for cin, cout, tag in ((64, 64, 'c64'), (128, 128, 'c128')):
            fms, ftf = conv_probe(n, hw, cin, cout, iters=30)
            ims, itf = bwd_conv_probe(n, hw, cin, cout, wrt='input',
                                      iters=30)
            wms, wtf = bwd_conv_probe(n, hw, cin, cout, wrt='filter',
                                      iters=30)
            bms, btf = bwd_conv_probe(n, hw, cin, cout, wrt='both',
                                      iters=30)
            out[f'bwd_{tag}'] = dict(
                fwd=dict(ms=round(fms, 2), tflops=round(ftf, 1)),
                grad_input=dict(ms=round(ims, 2), tflops=round(itf, 1)),
                grad_filter=dict(ms=round(wms, 2), tflops=round(wtf, 1)),
                grad_both=dict(ms=round(bms, 2), tflops=round(btf, 1)),
                bwd_over_fwd_rate=round(btf / ftf, 2))
            print('PARTIAL', json.dumps(out), flush=True)
        print(json.dumps(out, indent=1))
        return

    # -- decisive lane experiment at the stem geometry (126×256², 64ch) ----
    # (64→64 vs zero-padded 128→128: 4× the FLOPs; lane-limited ⇒ ~equal
    #  time, compute-limited ⇒ ~4× time)
    n, hw = 126, 256
    for cin, cout, tag in ((64, 64, 'c64'), (128, 128, 'c128_padded')):
        ms, tf = conv_probe(n, hw, cin, cout)
        out[f'lane_{tag}'] = dict(ms=round(ms, 2), tflops=round(tf, 1),
                                  mxu_pct=round(100 * tf / PEAK_TFLOPS, 1))
        print('PARTIAL', json.dumps(out), flush=True)

    # -- per-stage DoubleConv shapes at slide geometry ---------------------
    # (stage, hw, cin, cout): encoder downs + decoder ups of the flagship
    stages = [
        ('stem_conv1', 256, 3, 64), ('stem_conv2', 256, 64, 64),
        ('down1', 128, 64, 128), ('down1b', 128, 128, 128),
        ('down2', 64, 128, 256), ('down2b', 64, 256, 256),
        ('down3', 32, 256, 512), ('down3b', 32, 512, 512),
        ('down4', 16, 512, 512),
        ('up1', 32, 1024, 256), ('up1b', 32, 256, 256),
        ('up2', 64, 512, 128), ('up2b', 64, 128, 128),
        ('up3', 128, 256, 64), ('up3b', 128, 64, 64),
        ('up4', 256, 128, 64), ('up4b', 256, 64, 64),
    ]
    for name, hw, cin, cout in stages:
        ms, tf = conv_probe(n, hw, cin, cout, iters=6)
        out[name] = dict(hw=hw, cin=cin, cout=cout, ms=round(ms, 2),
                         tflops=round(tf, 1),
                         mxu_pct=round(100 * tf / PEAK_TFLOPS, 1))
        print('PARTIAL', json.dumps(out), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
