"""EGE-UNet head (≙ reference ``decode_heads/ege_head.py`` — dead-on-disk
in the reference: defined+decorated but not imported by its
``decode_heads/__init__.py``; carried here for full inventory parity).

Grouped multi-axis Hadamard-product attention (GHPA) encoder/decoder with
group-aggregation bridges (GAB) and ground-truth deep supervision.
Faithful notes: the reference's ``bridge=True, gt_ds=False`` path calls
``GAB(xh, xl)`` without the required ``mask`` arg (a TypeError there too),
and ``bridge=False`` still references the GAB modules — only the default
``bridge=True, gt_ds=True`` configuration is executable; asserted here
with a clear message. Outputs are sigmoid maps as in the reference.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import Conv2d, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead


def _ln_cf(name):
    """Reference 'channels_first' LayerNorm ≙ LN over NHWC's last axis."""
    return nn.LayerNorm(epsilon=1e-6, name=name)


class GroupAggregationBridge(nn.Module):
    """GAB (reference ``ege_head.py:50``): 4 dilated depthwise groups over
    (xh_i, xl_i, mask) concats, then a 1x1 tail."""
    dim_xl: int
    k_size: int = 3
    d_list: Sequence[int] = (1, 2, 5, 7)

    @nn.compact
    def __call__(self, xh, xl, mask):
        xh = Conv2d(self.dim_xl, 1, name='pre_project')(xh)
        xh = resize(xh, size=xl.shape[1:3], mode='bilinear',
                    align_corners=True, warning=False)
        q = self.dim_xl // 4
        outs = []
        for i, d in enumerate(self.d_list):
            g = jnp.concatenate([xh[..., i * q:(i + 1) * q],
                                 xl[..., i * q:(i + 1) * q], mask], axis=-1)
            g = _ln_cf(f'g{i}_norm')(g)
            pad = (self.k_size + (self.k_size - 1) * (d - 1)) // 2
            g = Conv2d(g.shape[-1], self.k_size, padding=pad, dilation=d,
                       groups=g.shape[-1], name=f'g{i}_conv')(g)
            outs.append(g)
        x = jnp.concatenate(outs, axis=-1)
        x = _ln_cf('tail_norm')(x)
        return Conv2d(self.dim_xl, 1, name='tail_conv')(x)


class GHPA(nn.Module):
    """Grouped multi-axis Hadamard-product attention
    (reference ``ege_head.py:101``): 4 channel groups gated by learned
    parameter grids interpolated to (H,W), (C,H) and (C,W), plus a
    depthwise group."""
    dim_out: int
    x: int = 8
    y: int = 8

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        c = dim_in // 4
        x = _ln_cf('norm1')(x)
        x1, x2, x3, x4 = jnp.split(x, 4, axis=-1)
        b, h, w, _ = x1.shape

        def dw_gelu_pw(g, kernel, name):
            g = Conv2d(c, kernel, padding=tuple(k // 2 for k in kernel)
                       if isinstance(kernel, tuple) else kernel // 2,
                       groups=c, name=f'{name}_0')(g)
            g = nn.gelu(g)
            return Conv2d(c, 1, name=f'{name}_2')(g)

        # xy gate: (1, x, y, c) params → (H, W)
        p_xy = self.param('params_xy', nn.initializers.ones,
                          (1, self.x, self.y, c), jnp.float32)
        g_xy = resize(p_xy.astype(x1.dtype), size=(h, w), mode='bilinear',
                      align_corners=True, warning=False)
        x1 = x1 * dw_gelu_pw(g_xy, (3, 3), 'conv_xy')

        # zx gate: params (1, c, x, 1) → (c, H); conv1d over H per channel
        p_zx = self.param('params_zx', nn.initializers.ones,
                          (1, c, self.x, 1), jnp.float32)
        g_zx = resize(p_zx.astype(x2.dtype), size=(c, h), mode='bilinear',
                      align_corners=True, warning=False)  # (1, c, H, 1)
        g_zx = jnp.transpose(g_zx, (0, 2, 3, 1))          # (1, H, 1, c)
        g_zx = dw_gelu_pw(g_zx, (3, 1), 'conv_zx')
        x2 = x2 * g_zx                                    # bcast over W

        # zy gate: params (1, c, y, 1) → (c, W); conv1d over W per channel
        p_zy = self.param('params_zy', nn.initializers.ones,
                          (1, c, self.y, 1), jnp.float32)
        g_zy = resize(p_zy.astype(x3.dtype), size=(c, w), mode='bilinear',
                      align_corners=True, warning=False)  # (1, c, W, 1)
        g_zy = jnp.transpose(g_zy, (0, 3, 2, 1))          # (1, 1, W, c)
        g_zy = dw_gelu_pw(g_zy, (1, 3), 'conv_zy')
        x3 = x3 * g_zy                                    # bcast over H

        # dw branch: 1x1 → GELU → dw 3x3
        x4 = Conv2d(c, 1, name='dw_0')(x4)
        x4 = nn.gelu(x4)
        x4 = Conv2d(c, 3, padding=1, groups=c, name='dw_2')(x4)

        out = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        out = _ln_cf('norm2')(out)
        out = Conv2d(dim_in, 3, padding=1, groups=dim_in, name='ldw_0')(out)
        out = nn.gelu(out)
        return Conv2d(self.dim_out, 1, name='ldw_2')(out)


@HEADS.register_module()
class EGEUNet(BaseDecodeHead):
    """EGE-UNet (reference ``ege_head.py:164``)."""
    c_list: Sequence[int] = (8, 16, 24, 32, 48, 64)
    input_channels: int = 3
    bridge: bool = True
    gt_ds: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.bridge and self.gt_ds, (
            'only bridge=True, gt_ds=True is executable — the reference '
            'forward calls GAB without a mask (TypeError) when gt_ds=False '
            'and references GAB modules when bridge=False')
        cl = list(self.c_list)

        def gn(y, name):
            return nn.GroupNorm(num_groups=4, name=name)(y)

        t = []
        out = x
        for i in range(6):
            if i < 3:
                out = Conv2d(cl[i], 3, padding=1,
                             name=f'encoder{i + 1}')(out)
            else:
                out = GHPA(cl[i], name=f'encoder{i + 1}')(out)
            if i < 5:
                out = nn.gelu(max_pool2d(gn(out, f'ebn{i + 1}'), 2))
            else:
                out = nn.gelu(out)
            t.append(out)
        t1, t2, t3, t4, t5, t6 = t

        gt_outs = []

        def stage(out, skip_hi, skip_lo, dec, dbn, gt_conv, gab, up,
                  scale):
            y = dec(out)
            y = gn(y, dbn)
            if up:
                y = resize(y, scale_factor=2, mode='bilinear',
                           align_corners=True, warning=False)
            y = nn.gelu(y)
            gt = Conv2d(1, 1, name=gt_conv)(y)
            skip = gab(skip_hi, skip_lo, gt)
            gt_outs.append(nn.sigmoid(resize(
                gt, scale_factor=scale, mode='bilinear', align_corners=True,
                warning=False)))
            return y + skip

        out5 = stage(t6, t6, t5, GHPA(cl[4], name='decoder1'), 'dbn1',
                     'gt_conv1', GroupAggregationBridge(cl[4], name='GAB5'),
                     False, 32)
        out4 = stage(out5, t5, t4, GHPA(cl[3], name='decoder2'), 'dbn2',
                     'gt_conv2', GroupAggregationBridge(cl[3], name='GAB4'),
                     True, 16)
        out3 = stage(out4, t4, t3, GHPA(cl[2], name='decoder3'), 'dbn3',
                     'gt_conv3', GroupAggregationBridge(cl[2], name='GAB3'),
                     True, 8)
        out2 = stage(out3, t3, t2,
                     Conv2d(cl[1], 3, padding=1, name='decoder4'), 'dbn4',
                     'gt_conv4', GroupAggregationBridge(cl[1], name='GAB2'),
                     True, 4)
        out1 = stage(out2, t2, t1,
                     Conv2d(cl[0], 3, padding=1, name='decoder5'), 'dbn5',
                     'gt_conv5', GroupAggregationBridge(cl[0], name='GAB1'),
                     True, 2)
        out0 = Conv2d(self.num_classes if self.num_classes > 1 else 1, 1,
                      name='final')(out1)
        out0 = resize(out0, scale_factor=2, mode='bilinear',
                      align_corners=True, warning=False)
        return tuple(gt_outs), nn.sigmoid(out0)

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        """Deep supervision: the final map carries the base loss; the gt_ds
        maps are auxiliary (the reference never wires losses for this dead
        head — the final-output loss is the sensible default)."""
        if isinstance(seg_logit, tuple) and isinstance(seg_logit[0], tuple):
            seg_logit = seg_logit[1]
        return super().loss_by_feat(seg_logit, seg_label, seg_weight)
