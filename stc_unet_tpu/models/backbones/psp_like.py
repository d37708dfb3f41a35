"""Shared PPM-with-bottleneck helper used by FastSCNN/ICNet backbones."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, adaptive_avg_pool2d


class PPMJoin(nn.Module):
    """Pyramid pooling + concat + 3x3 bottleneck.

    ``branch_channels`` defaults to in//len(scales) (FastSCNN's PPM usage,
    fast_scnn.py:142-149, where x is concatenated FIRST); ICNet passes
    explicit branch widths and ``x_first=False`` (psp_head.py PPM returns
    pools only and icnet.py:152-156 appends x last)."""
    out_channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False
    branch_channels: Optional[int] = None
    x_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        bc = self.branch_channels or x.shape[-1] // len(self.pool_scales)
        pools = []
        for i, s in enumerate(self.pool_scales):
            p = adaptive_avg_pool2d(x, s)
            p = ConvModule(bc, 1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'pool_convs_{i}')(p, train=train)
            pools.append(resize(p, size=x.shape[1:3], mode='bilinear',
                                align_corners=self.align_corners,
                                warning=False))
        outs = [x] + pools if self.x_first else pools + [x]
        out = jnp.concatenate(outs, axis=-1)
        return ConvModule(self.out_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='bottleneck')(out, train=train)
