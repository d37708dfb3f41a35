"""Shared PPM-with-bottleneck helper used by FastSCNN/ICNet backbones."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, adaptive_avg_pool2d


class PPMJoin(nn.Module):
    """Pyramid pooling + concat + 1x1 bottleneck."""
    out_channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(x, s)
            p = ConvModule(x.shape[-1] // len(self.pool_scales), 1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'pool_convs_{i}')(p, train=train)
            outs.append(resize(p, size=x.shape[1:3], mode='bilinear',
                               align_corners=self.align_corners,
                               warning=False))
        out = jnp.concatenate(outs, axis=-1)
        return ConvModule(self.out_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='bottleneck')(out, train=train)
