"""JPU neck — joint pyramid upsampling (≙ reference ``necks/jpu.py``,
FastFCN)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, DepthwiseSeparableConvModule
from ..builder import NECKS


@NECKS.register_module()
class JPU(nn.Module):
    """Fuse the top levels with parallel dilated separable convs."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    start_level: int = 0
    end_level: int = -1
    dilations: Sequence[int] = (1, 2, 4, 8)
    align_corners: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # ≙ reference ``jpu.py:55-65`` (test_jpu.py:32-34)
        assert isinstance(self.in_channels, (list, tuple)), \
            'in_channels must be a tuple'
        assert isinstance(self.dilations, (list, tuple)), \
            'dilations must be a tuple'
        if self.end_level != -1:
            assert self.end_level <= len(self.in_channels), \
                f'end_level {self.end_level} exceeds the number of ' \
                f'input levels ({len(self.in_channels)})'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(inputs) if self.end_level == -1 else self.end_level
        used = inputs[self.start_level:end]
        # reference jpu.py:51-52 defaults: norm BN, act ReLU
        norm_cfg = self.norm_cfg or dict(type='BN')
        feats = [
            ConvModule(self.mid_channels, 3, padding=1,
                       norm_cfg=norm_cfg,
                       act_cfg=self.act_cfg or dict(type='ReLU'),
                       name=f'conv_{i}')(x, train=train)
            for i, x in enumerate(used)
        ]
        size = feats[0].shape[1:3]
        feats = [feats[0]] + [
            resize(f, size=size, mode='bilinear',
                   align_corners=self.align_corners, warning=False)
            for f in feats[1:]
        ]
        feat = jnp.concatenate(feats, axis=-1)
        outs = [
            DepthwiseSeparableConvModule(
                self.mid_channels, 3, padding=d, dilation=d,
                norm_cfg=norm_cfg, dw_act_cfg=None,
                act_cfg=self.act_cfg or dict(type='ReLU'),
                name=f'dilation_{i}')(feat, train=train)
            for i, d in enumerate(self.dilations)
        ]
        fused = jnp.concatenate(outs, axis=-1)
        # reference jpu.py:123-131 — pass through inputs[start:end-1], then
        # the fused map (NOT always inputs[:-1])
        return list(inputs[self.start_level:end - 1]) + [fused]
