"""UPerHead (≙ reference ``decode_heads/uper_head.py``): PSP on the deepest
level + FPN-style top-down fusion over all levels."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead
from .psp_head import PPM


@HEADS.register_module()
class UPerHead(BaseDecodeHead):
    """Unified Perceptual Parsing head."""
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: object = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        inputs = self._transform_inputs(inputs)
        # PSP on the last level
        x = inputs[-1]
        psp_outs = [x] + PPM(self.pool_scales, self.channels,
                             conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg,
                             align_corners=self.align_corners,
                             name='psp_modules')(x, train=train)
        psp_out = ConvModule(self.channels, 3, padding=1,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name='bottleneck')(
            jnp.concatenate(psp_outs, axis=-1), train=train)

        # laterals
        laterals = [
            ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'lateral_convs_{i}')(inputs[i], train=train)
            for i in range(len(inputs) - 1)
        ] + [psp_out]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], size=laterals[i - 1].shape[1:3],
                mode='bilinear', align_corners=self.align_corners,
                warning=False)
        fpn_outs = [
            ConvModule(self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'fpn_convs_{i}')(laterals[i], train=train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        fpn_outs = [
            resize(f, size=fpn_outs[0].shape[1:3], mode='bilinear',
                   align_corners=self.align_corners, warning=False)
            for f in fpn_outs
        ]
        out = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='fpn_bottleneck')(
            jnp.concatenate(fpn_outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
