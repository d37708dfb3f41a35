"""PSPHead (≙ reference ``mmseg/models/decode_heads/psp_head.py:11,63``)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, adaptive_avg_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class PPM(nn.Module):
    """Pyramid pooling module (reference ``psp_head.py:11``): per-scale
    adaptive avg-pool → 1x1 conv → upsample back."""
    pool_scales: Sequence[int]
    channels: int
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, scale in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool2d(x, scale)
            out = ConvModule(self.channels, 1, conv_cfg=self.conv_cfg,
                             norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                             name=f'{i}')(pooled, train=train)
            outs.append(resize(out, size=x.shape[1:3], mode='bilinear',
                               align_corners=self.align_corners,
                               warning=False))
        return outs


@HEADS.register_module()
class PSPHead(BaseDecodeHead):
    """Pyramid Scene Parsing head (reference ``psp_head.py:63``)."""

    pool_scales: Sequence[int] = (1, 2, 3, 6)

    def __post_init__(self):
        # reference ``psp_head.py:82``
        assert isinstance(self.pool_scales, (list, tuple)), \
            f'pool_scales must be a list/tuple, got {self.pool_scales!r}'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        psp_outs = [x] + PPM(self.pool_scales, self.channels,
                             conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                             act_cfg=self.act_cfg,
                             align_corners=self.align_corners,
                             name='psp_modules')(x, train=train)
        feats = ConvModule(self.channels, 3, padding=1,
                           conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate(psp_outs, axis=-1), train=train)
        return self.cls_seg(feats, train=train)
