"""Pallas fused DoubleConv kernel: conv3x3+BN+ReLU twice in ONE pass.

Why: the STC-UNet hot path is stacks of DoubleConv (reference
``unet_backbone.py:116``). Under XLA the intermediate activation between the
two convs round-trips HBM (conv outputs cannot fuse into the next conv);
at 256²x64ch x 72 tiles that's ~600 MB per DoubleConv per slide call —
the measured program moves 106 GB/call at ~40% of HBM peak. This kernel
keeps the intermediate in VMEM: HBM traffic per DoubleConv drops to
input + output + weights.

Inference-only (BN folded to per-channel scale/bias by the caller —
eval-mode BN is exactly ``y = x * scale' + bias'``). The convolution is
expressed as 9 shifted (M, Cin) @ (Cin, Cout) matmuls per conv — all MXU
work, fp32 accumulation.

Layout: NHWC; grid over (batch, row-tiles, col-tiles); the input tile
(+2 halo per conv) is DMA'd HBM→VMEM per grid step.

STATUS (round-1 measurement, v5e): correct on hardware, but the
shifted-matmul formulation reaches only ~20 TFLOP/s at STC shapes
(72x256²x64ch: 88.5 ms vs ~14 ms for XLA's conv pair) — the small
per-shift matmuls (M≈1.3k, K=128 half-padded, N=64) and sublane-shift
relayouts dominate. XLA's conv kernels remain the production path; this op
stays as tested groundwork for a register-tiled reformulation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            out_ref, *, th: int, tw: int, w: int, cin: int, cmid: int,
            cout: int, acc_dtype):
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    w_idx = pl.program_id(2)

    def body(x_vmem, sem):
        # fetch the (row, col) tile with halo; DMA extents are 8-aligned
        dma = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h_idx * th, th + 8),
                     pl.ds(w_idx * tw, tw + 8)], x_vmem, sem)
        dma.start()
        dma.wait()

        x = x_vmem[:]
        # conv1: valid 3x3 over the (th+4, tw+4) region → (th+2, tw+2)
        m1 = (th + 2) * (tw + 2)
        acc = jnp.zeros((m1, cmid), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                patch = x[dy:dy + th + 2, dx:dx + tw + 2, :]
                acc += jnp.dot(patch.reshape(m1, cin),
                               w1_ref[dy, dx].astype(x.dtype),
                               preferred_element_type=acc_dtype)
        y1 = acc * s1_ref[:].astype(acc_dtype) + b1_ref[:].astype(acc_dtype)
        y1 = jnp.maximum(y1, 0).reshape(th + 2, tw + 2, cmid)
        # zero y1 positions lying OUTSIDE the image — they are conv2's
        # zero padding (edges only on boundary tiles)
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 2, 1), 1)
        nh = pl.num_programs(1)
        nw = pl.num_programs(2)
        pad_top = (h_idx == 0) & (row == 0)
        pad_bot = (h_idx == nh - 1) & (row == th + 1)
        pad_l = (w_idx == 0) & (col == 0)
        pad_r = (w_idx == nw - 1) & (col == tw + 1)
        y1 = jnp.where(pad_top | pad_bot | pad_l | pad_r, 0, y1)
        y1 = y1.astype(x.dtype)

        # conv2: valid 3x3 over (th+2, tw+2) → (th, tw)
        m2 = th * tw
        acc2 = jnp.zeros((m2, cout), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                patch = y1[dy:dy + th, dx:dx + tw, :]
                acc2 += jnp.dot(patch.reshape(m2, cmid),
                                w2_ref[dy, dx].astype(x.dtype),
                                preferred_element_type=acc_dtype)
        y2 = acc2 * s2_ref[:].astype(acc_dtype) + \
            b2_ref[:].astype(acc_dtype)
        y2 = jnp.maximum(y2, 0).reshape(1, th, tw, cout)
        out_ref[:] = y2.astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((th + 8, tw + 8, cin), x_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BN → (scale', bias') such that y = x*scale' + bias'."""
    inv = scale / np.sqrt(np.asarray(var) + eps)
    return inv, bias - mean * inv


@functools.partial(jax.jit, static_argnames=('tile_h', 'tile_w',
                                              'interpret'))
def fused_double_conv(x, w1, s1, b1, w2, s2, b2, tile_h: int = 16,
                      tile_w: int = 128, interpret: bool = False):
    """y = relu((relu((x⊛w1)·s1+b1))⊛w2·s2+b2), one fused pallas program.

    x (B, H, W, Cin) NHWC; w1 (3, 3, Cin, Cmid) HWIO; w2 (3, 3, Cmid, Cout);
    s/b per-channel folded BN. H/W must divide by tile_h/tile_w; tiles and
    channels are Mosaic-aligned internally.
    """
    b, h, w, cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    tile_w = min(tile_w, w)
    assert h % tile_h == 0, f'H={h} not divisible by tile_h={tile_h}'
    assert w % tile_w == 0, f'W={w} not divisible by tile_w={tile_w}'
    assert tile_h % 8 == 0 and tile_w % 8 == 0, \
        'tiles must be 8-aligned (Mosaic tiling)'
    # Mosaic DMA alignment: rows/cols (sublane) to 8, channels (lane) to
    # 128; zero-padded channels contribute nothing (weights zero-padded)
    cinp = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, cinp - cin)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, cinp - cin), (0, 0)))
    kern = functools.partial(_kernel, th=tile_h, tw=tile_w, w=w, cin=cinp,
                             cmid=cmid, cout=cout, acc_dtype=jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(b, h // tile_h, w // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # s2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, tile_w, cout), lambda bi, hi, wi: (bi, hi, wi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(xp, w1p, s1, b1, w2, s2, b2)
