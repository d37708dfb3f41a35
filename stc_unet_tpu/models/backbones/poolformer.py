"""PoolFormer backbone (≙ reference zoo ``configs/poolformer`` via mmcls):
MetaFormer blocks whose token mixer is just average pooling."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..bricks import Conv2d, avg_pool2d
from ..builder import BACKBONES
from ..utils.swin_core import DropPath

_ARCH = {
    's12': dict(layers=(2, 2, 6, 2), embed_dims=(64, 128, 320, 512)),
    's24': dict(layers=(4, 4, 12, 4), embed_dims=(64, 128, 320, 512)),
    's36': dict(layers=(6, 6, 18, 6), embed_dims=(64, 128, 320, 512)),
    'm36': dict(layers=(6, 6, 18, 6), embed_dims=(96, 192, 384, 768)),
    'm48': dict(layers=(8, 8, 24, 8), embed_dims=(96, 192, 384, 768)),
}


class GroupNorm1(nn.Module):
    """GroupNorm with a single group (PoolFormer's norm)."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=1, epsilon=1e-5,
                            param_dtype=jnp.float32)(x)


class PoolFormerBlock(nn.Module):
    dim: int
    pool_size: int = 3
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        g1 = self.param('layer_scale_1', nn.initializers.constant(
            self.layer_scale_init_value), (self.dim,), jnp.float32)
        g2 = self.param('layer_scale_2', nn.initializers.constant(
            self.layer_scale_init_value), (self.dim,), jnp.float32)
        y = GroupNorm1(name='norm1')(x)
        p = self.pool_size
        pooled = avg_pool2d(y, p, stride=1, padding=p // 2,
                            count_include_pad=False)
        y = pooled - y  # token mixing = pooling residual
        x = x + DropPath(self.drop_path, name='dp1')(
            g1.astype(x.dtype) * y, train=train)
        y = GroupNorm1(name='norm2')(x)
        y = Conv2d(int(self.dim * self.mlp_ratio), 1, name='fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(self.dim, 1, name='fc2')(y)
        return x + DropPath(self.drop_path, name='dp2')(
            g2.astype(x.dtype) * y, train=train)


@BACKBONES.register_module()
class PoolFormer(nn.Module):
    """PoolFormer s12..m48."""
    arch: str = 's12'
    in_channels: int = 3
    pool_size: int = 3
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 2, 4, 6)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    frozen_stages: int = -1
    # mmcls patch-embed knobs (accepted for config parity)
    in_patch_size: int = 7
    in_stride: int = 4
    in_pad: int = 2
    down_patch_size: int = 3
    down_stride: int = 2
    down_pad: int = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = _ARCH[self.arch]
        layers, dims = arch['layers'], arch['embed_dims']
        dpr = list(np.linspace(0, self.drop_path_rate, sum(layers)))
        cur = 0
        outs = []
        # mmcls network ordering: [embed, stage, embed, stage, ...] with
        # out_indices over that flat list (0, 2, 4, 6 = after each stage)
        flat_idx = 0
        for i in range(4):
            k, s, p = (self.in_patch_size, self.in_stride, self.in_pad) \
                if i == 0 else (self.down_patch_size, self.down_stride,
                                self.down_pad)
            x = Conv2d(dims[i], k, s, padding=p,
                       name=f'patch_embed{i}')(x)
            for j in range(layers[i]):
                x = PoolFormerBlock(dims[i], self.pool_size,
                                    self.mlp_ratio, dpr[cur + j],
                                    name=f'blocks{i}_{j}')(x, train=train)
            cur += layers[i]
            flat_idx += 2
            if (flat_idx - 2) in self.out_indices or \
                    i * 2 in self.out_indices:
                outs.append(x)
        return outs


BACKBONES.register_module(name='mmcls.PoolFormer', module=PoolFormer)
