"""FCNHead (≙ reference ``mmseg/models/decode_heads/fcn_head.py``)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class FCNHead(BaseDecodeHead):
    """N stacked convs (+ optional input concat) then classifier."""

    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1

    def __post_init__(self):
        # ≙ reference ``fcn_head.py:30,36`` (test_fcn_head.py:13-15)
        assert self.num_convs >= 0 and self.dilation > 0 and \
            isinstance(self.dilation, int), \
            f'invalid num_convs {self.num_convs} / dilation {self.dilation}'
        if self.num_convs == 0:
            assert (not isinstance(self.in_channels, (list, tuple)) and
                    self.in_channels == self.channels), \
                'num_convs=0 requires in_channels == channels'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = x
        conv_padding = (self.kernel_size // 2) * self.dilation
        for i in range(self.num_convs):
            feats = ConvModule(
                self.channels, self.kernel_size, padding=conv_padding,
                dilation=self.dilation, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'convs_{i}')(feats, train=train)
        if self.concat_input and self.num_convs > 0:
            feats = ConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, conv_cfg=self.conv_cfg,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name='conv_cat')(jnp.concatenate([x, feats], axis=-1),
                                 train=train)
        return self.cls_seg(feats, train=train)
