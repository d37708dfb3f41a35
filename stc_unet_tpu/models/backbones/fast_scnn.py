"""FastSCNN backbone (≙ reference ``backbones/fast_scnn.py``, 409 LoC).

Three paths: learning-to-downsample (conv + 2 dw-sep convs), global feature
extractor (inverted residuals + PPM), and a feature-fusion module. Returns
(higher_res, lower_res, fused) like the reference.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, DepthwiseSeparableConvModule
from ..builder import BACKBONES
from ..utils.inverted_residual import InvertedResidual
from .psp_like import PPMJoin


@BACKBONES.register_module()
class FastSCNN(nn.Module):
    in_channels: int = 3
    downsample_dw_channels: Sequence[int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Sequence[int] = (64, 96, 128)
    global_block_strides: Sequence[int] = (2, 2, 1)
    global_out_channels: int = 128
    higher_in_channels: int = 64
    lower_in_channels: int = 128
    fusion_out_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2)
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False
    dw_act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``fast_scnn.py:353-358``: the fusion wiring fixes the
        # channel equalities
        if self.global_in_channels != self.higher_in_channels:
            raise AssertionError('Global Input Channels must be the same '
                                 'with Higher Input Channels!')
        if self.global_out_channels != self.lower_in_channels:
            raise AssertionError('Global Output Channels must be the same '
                                 'with Lower Input Channels!')
        assert len(self.global_block_channels) == \
            len(self.global_block_strides) == 3, \
            'global_block_channels/strides must have length 3'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        # learning to downsample
        x = ConvModule(self.downsample_dw_channels[0], 3, 2, padding=1,
                       norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='ld_conv')(x, train=train)
        # reference fast_scnn.py:58-74: the LTD dsconvs get dw_act_cfg
        # (default None → NO dw activation) and the mmcv-default ReLU on
        # the pointwise conv
        x = DepthwiseSeparableConvModule(
            self.downsample_dw_channels[1], 3, stride=2, padding=1,
            norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
            dw_act_cfg=self.dw_act_cfg,
            name='ld_dsconv1')(x, train=train)
        higher = DepthwiseSeparableConvModule(
            self.global_in_channels, 3, stride=2, padding=1,
            norm_cfg=norm_cfg, act_cfg=dict(type='ReLU'),
            dw_act_cfg=self.dw_act_cfg,
            name='ld_dsconv2')(x, train=train)
        # global feature extractor
        g = higher
        for i, (ch, s) in enumerate(zip(self.global_block_channels,
                                        self.global_block_strides)):
            for j in range(3):
                g = InvertedResidual(ch, stride=s if j == 0 else 1,
                                     expand_ratio=6, norm_cfg=norm_cfg,
                                     act_cfg=act_cfg,
                                     name=f'gfe_{i}_{j}')(g, train=train)
        lower = PPMJoin(self.global_out_channels, (1, 2, 3, 6),
                        norm_cfg=norm_cfg, act_cfg=act_cfg,
                        align_corners=self.align_corners,
                        name='ppm')(g, train=train)
        # feature fusion
        low_up = resize(lower, size=higher.shape[1:3], mode='bilinear',
                        align_corners=self.align_corners, warning=False)
        # reference fast_scnn.py:230-238: the FFM dwconv is ONE grouped 3x3
        # ConvModule WITH activation (dwconv_act_cfg = act_cfg), not a
        # depthwise-separable pair
        low_up = ConvModule(self.fusion_out_channels, 3, padding=1,
                            groups=self.fusion_out_channels,
                            norm_cfg=norm_cfg, act_cfg=act_cfg,
                            name='ffm_dwconv')(low_up, train=train)
        low_up = ConvModule(self.fusion_out_channels, 1,
                            norm_cfg=norm_cfg, act_cfg=None,
                            name='ffm_low_conv')(low_up, train=train)
        high = ConvModule(self.fusion_out_channels, 1, norm_cfg=norm_cfg,
                          act_cfg=None, name='ffm_high_conv')(higher,
                                                              train=train)
        fused = nn.relu(high + low_up)
        outs = [higher, lower, fused]
        return [outs[i] for i in self.out_indices]
