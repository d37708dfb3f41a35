"""MobileNetV2 backbone (≙ reference ``backbones/mobilenet_v2.py``)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from ..bricks import ConvModule
from ..builder import BACKBONES
from ..utils.inverted_residual import InvertedResidual, make_divisible

# expand_ratio, channel, num_blocks per stage
_ARCH = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4), (6, 96, 3),
         (6, 160, 3), (6, 320, 1)]


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    """MobileNetV2 with dilation support for seg (strides/dilations)."""
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    norm_eval: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU6')
        in_ch = make_divisible(32 * self.widen_factor, 8)
        x = ConvModule(in_ch, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='conv1')(x, train=train)
        outs = []
        for i, (expand, channel, num_blocks) in enumerate(_ARCH):
            out_ch = make_divisible(channel * self.widen_factor, 8)
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                x = InvertedResidual(
                    out_ch, stride=stride, expand_ratio=expand,
                    dilation=self.dilations[i], norm_cfg=norm_cfg,
                    act_cfg=act_cfg,
                    name=f'layer{i + 1}_{j}')(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return outs
