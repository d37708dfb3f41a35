"""ASPPHead (≙ reference ``mmseg/models/decode_heads/aspp_head.py:11,54``)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class ASPPModule(nn.Module):
    """Parallel atrous convs (reference ``aspp_head.py:11``)."""
    dilations: Sequence[int]
    channels: int
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None
    separable: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, dilation in enumerate(self.dilations):
            k = 1 if dilation == 1 else 3
            pad = 0 if dilation == 1 else dilation
            if self.separable and k != 1:
                from ..bricks import DepthwiseSeparableConvModule
                outs.append(DepthwiseSeparableConvModule(
                    self.channels, k, padding=pad, dilation=dilation,
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    name=f'{i}')(x, train=train))
            else:
                outs.append(ConvModule(
                    self.channels, k, padding=pad, dilation=dilation,
                    conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                    act_cfg=self.act_cfg, name=f'{i}')(x, train=train))
        return outs


@HEADS.register_module()
class ASPPHead(BaseDecodeHead):
    """Atrous spatial pyramid pooling head (reference ``aspp_head.py:54``)."""

    dilations: Sequence[int] = (1, 6, 12, 18)

    def __post_init__(self):
        # ≙ reference ``aspp_head.py:67`` (test_aspp_head.py:11-13)
        assert isinstance(self.dilations, (list, tuple)), \
            'dilations must be a list/tuple'
        super().__post_init__()

    def _aspp_forward(self, x, train: bool, separable: bool = False):
        # global image pool branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        img_feat = ConvModule(self.channels, 1, conv_cfg=self.conv_cfg,
                              norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                              name='image_pool_conv')(pooled, train=train)
        img_feat = resize(img_feat, size=x.shape[1:3], mode='bilinear',
                          align_corners=self.align_corners, warning=False)
        aspp_outs = [img_feat] + ASPPModule(
            self.dilations, self.channels, conv_cfg=self.conv_cfg,
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            separable=separable, name='aspp_modules')(x, train=train)
        return jnp.concatenate(aspp_outs, axis=-1)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        aspp = self._aspp_forward(x, train)
        feats = ConvModule(self.channels, 3, padding=1,
                           conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg,
                           name='bottleneck')(aspp, train=train)
        return self.cls_seg(feats, train=train)
