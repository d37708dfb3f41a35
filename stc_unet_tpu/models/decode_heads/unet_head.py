"""U-Net decoder head with optional coordinate attention.

TPU-native rebuild of reference ``mmseg/models/decode_heads/unet_head.py:12``
(UnetHead / Up / DoubleConv / CoordAtt). NHWC; upsampling via the
torch-parity bilinear ``resize``; the ``se=True`` path adds the CoordAtt
residual gate on the concatenated skip (reference ``unet_head.py:56-57``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, h_swish, pad_hw
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) × 2 — reference ``unet_head.py:63``."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_ch, 3, padding=1, name='conv0')(x)
        x = BatchNorm(name='bn1')(x, train=train)
        x = nn.relu(x)
        x = Conv2d(self.out_ch, 3, padding=1, name='conv3')(x)
        x = BatchNorm(name='bn4')(x, train=train)
        x = nn.relu(x)
        return x


class CoordAtt(nn.Module):
    """Coordinate attention gate — reference ``unet_head.py:116-146``.

    H-strip and W-strip average pools → shared 1x1 conv bottleneck (BN +
    h_swish) → per-axis 1x1 conv + sigmoid → outer-product gate a_w * a_h.
    Returns the gate; with ``residual=True`` returns ``a_w * a_h + x``
    (the reference Up usage, ``unet_head.py:56`` — note the author's
    additive quirk: the gate is ADDED, not multiplied).

    Perf note: fused Pallas strip-pool/gate-add kernels exist
    (``ops/coordatt_fused.py``) and beat the XLA chain 1.29x standalone
    at the slide geometry, but REGRESS the full program (custom-call
    layout-boundary copies) — so the model default is the plain XLA
    chain; ``STC_UNET_TPU_FUSED_COORDATT=on`` forces the fused eval
    path for re-measurement. Full measurement trail:
    ``docs/data/coordatt_fused_probe.json`` / ``_inprogram.json``.
    """
    oup: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False, residual: bool = False):
        from stc_unet_tpu.ops.coordatt_fused import (coordatt_fused_enabled,
                                                     gate_add, strip_pools)
        n, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        fused = residual and not train and coordatt_fused_enabled()
        if fused:
            sh, sw = strip_pools(x)                         # f32 sums
            x_h = (sh / w).astype(x.dtype)[:, :, None, :]   # (N, H, 1, C)
            x_w_t = (sw / h).astype(x.dtype)[:, :, None, :]  # (N, W, 1, C)
        else:
            # strip pools accumulate in f32: bf16-native reductions lower
            # ~10x slower on TPU (see KernelSelectAttention note)
            xf = x.astype(jnp.float32)
            x_h = jnp.mean(xf, axis=2, keepdims=True).astype(x.dtype)
            x_w = jnp.mean(xf, axis=1, keepdims=True).astype(x.dtype)
            x_w_t = jnp.transpose(x_w, (0, 2, 1, 3))        # (N, W, 1, C)
        y = jnp.concatenate([x_h, x_w_t], axis=1)           # (N, H+W, 1, C)
        y = Conv2d(mip, 1, name='conv1')(y)
        y = BatchNorm(name='bn1')(y, train=train)
        y = h_swish(y)
        y_h, y_w = y[:, :h], y[:, h:]
        y_w = jnp.transpose(y_w, (0, 2, 1, 3))              # (N, 1, W, mip)
        a_h = nn.sigmoid(Conv2d(self.oup, 1, name='conv_h')(y_h))
        a_w = nn.sigmoid(Conv2d(self.oup, 1, name='conv_w')(y_w))
        if fused:
            return gate_add(x, a_h[:, :, 0, :], a_w[:, 0, :, :])
        gate = a_w * a_h
        return gate + x if residual else gate


class Up(nn.Module):
    """Upsample + pad-to-match + concat skip (+CoordAtt) + DoubleConv.

    Reference ``unet_head.py:35-60``; bilinear 2x with align_corners=True.
    """
    out_ch: int
    se: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = resize(x1, scale_factor=2, mode='bilinear', align_corners=True,
                    warning=False)
        diff_y = x2.shape[1] - x1.shape[1]
        diff_x = x2.shape[2] - x1.shape[2]
        if diff_y or diff_x:
            x1 = pad_hw(x1, (diff_x // 2, diff_x - diff_x // 2,
                             diff_y // 2, diff_y - diff_y // 2))
        x = jnp.concatenate([x2, x1], axis=-1)
        if self.se:
            x = CoordAtt(x.shape[-1], name='ca')(x, train=train,
                                                 residual=True)
        return DoubleConv(self.out_ch, name='conv')(x, train=train)


@HEADS.register_module()
class UnetHead(BaseDecodeHead):
    """U-Net decoder over 5 encoder scales — reference ``unet_head.py:12``."""
    decoder_channel: Sequence[int] = (1024, 512, 256, 128, 64)
    se: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        dc = list(self.decoder_channel)
        out = Up(dc[0] // 4, se=self.se, name='up1')(inputs[4], inputs[3],
                                                     train=train)
        out = Up(dc[1] // 4, se=self.se, name='up2')(out, inputs[2],
                                                     train=train)
        out = Up(dc[2] // 4, se=self.se, name='up3')(out, inputs[1],
                                                     train=train)
        out = Up(dc[4], se=self.se, name='up4')(out, inputs[0], train=train)
        return self.cls_seg(out, train=train)
