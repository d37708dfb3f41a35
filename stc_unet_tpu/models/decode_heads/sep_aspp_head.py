"""DepthwiseSeparableASPPHead — DeepLabV3+
(≙ reference ``mmseg/models/decode_heads/sep_aspp_head.py:30``)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, DepthwiseSeparableConvModule
from ..builder import HEADS
from .aspp_head import ASPPHead


@HEADS.register_module()
class DepthwiseSeparableASPPHead(ASPPHead):
    """ASPP with separable convs + low-level (c1) skip fusion."""

    c1_in_channels: int = 0
    c1_channels: int = 48

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        aspp = self._aspp_forward(x, train, separable=True)
        output = ConvModule(self.channels, 3, padding=1,
                            conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                            act_cfg=self.act_cfg,
                            name='bottleneck')(aspp, train=train)
        if self.c1_in_channels > 0:
            c1_output = ConvModule(self.c1_channels, 1,
                                   conv_cfg=self.conv_cfg,
                                   norm_cfg=self.norm_cfg,
                                   act_cfg=self.act_cfg,
                                   name='c1_bottleneck')(inputs[0],
                                                         train=train)
            output = resize(output, size=c1_output.shape[1:3],
                            mode='bilinear',
                            align_corners=self.align_corners, warning=False)
            output = jnp.concatenate([output, c1_output], axis=-1)
        output = DepthwiseSeparableConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, name='sep_bottleneck_0')(output,
                                                           train=train)
        output = DepthwiseSeparableConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, name='sep_bottleneck_1')(output,
                                                           train=train)
        return self.cls_seg(output, train=train)
