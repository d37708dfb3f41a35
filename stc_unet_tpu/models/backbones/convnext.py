"""ConvNeXt backbone (≙ reference zoo ``configs/convnext`` via
mmcls ConvNeXt) and a TIMMBackbone shim.

ConvNeXt block: 7x7 depthwise → LN → pw 4x expand → GELU → pw project,
LayerScale gamma, stochastic depth. NHWC-native (ConvNeXt's own layout).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..bricks import Conv2d
from ..builder import BACKBONES
from ..utils.swin_core import DropPath

_ARCH = {
    'tiny': dict(depths=(3, 3, 9, 3), channels=(96, 192, 384, 768)),
    'small': dict(depths=(3, 3, 27, 3), channels=(96, 192, 384, 768)),
    'base': dict(depths=(3, 3, 27, 3), channels=(128, 256, 512, 1024)),
    'large': dict(depths=(3, 3, 27, 3), channels=(192, 384, 768, 1536)),
    'xlarge': dict(depths=(3, 3, 27, 3), channels=(256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv2d(self.dim, 7, padding=3, groups=self.dim,
                   name='depthwise_conv')(x)
        y = nn.LayerNorm(name='norm', dtype=y.dtype)(y)
        y = nn.Dense(4 * self.dim, dtype=y.dtype, name='pointwise_conv1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=y.dtype, name='pointwise_conv2')(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param('gamma', nn.initializers.constant(
                self.layer_scale_init_value), (self.dim,), jnp.float32)
            y = gamma.astype(y.dtype) * y
        return x + DropPath(self.drop_path, name='drop_path')(y,
                                                              train=train)


@BACKBONES.register_module()
class ConvNeXt(nn.Module):
    """ConvNeXt for segmentation (UPerNet pairing)."""
    arch: str = 'tiny'
    in_channels: int = 3
    stem_patch_size: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    gap_before_final_norm: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = _ARCH[self.arch]
        depths, channels = arch['depths'], arch['channels']
        dpr = list(np.linspace(0, self.drop_path_rate, sum(depths)))
        cur = 0
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(channels[0],
                            (self.stem_patch_size, self.stem_patch_size),
                            strides=(self.stem_patch_size,
                                     self.stem_patch_size),
                            padding='VALID', dtype=x.dtype, name='stem')(x)
                x = nn.LayerNorm(name='stem_norm', dtype=x.dtype)(x)
            else:
                x = nn.LayerNorm(name=f'downsample_norm{i}',
                                 dtype=x.dtype)(x)
                x = nn.Conv(channels[i], (2, 2), strides=(2, 2),
                            padding='VALID', dtype=x.dtype,
                            name=f'downsample{i}')(x)
            for j in range(depths[i]):
                x = ConvNeXtBlock(channels[i], dpr[cur + j],
                                  self.layer_scale_init_value,
                                  name=f'stages_{i}_{j}')(x, train=train)
            cur += depths[i]
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f'norm{i}',
                                         dtype=x.dtype)(x))
        return outs


BACKBONES.register_module(name='mmcls.ConvNeXt', module=ConvNeXt)


@BACKBONES.register_module()
class TIMMBackbone(nn.Module):
    """timm wrapper (≙ reference ``backbones/timm_backbone.py``). The timm
    package is torch-based and not part of the jax compute path; building
    raises a clear error instructing to use a native backbone."""
    model_name: str = ''
    features_only: bool = True
    pretrained: bool = False
    in_channels: int = 3
    init_cfg: Optional[dict] = None

    def __call__(self, x, train: bool = False):
        raise NotImplementedError(
            'TIMMBackbone wraps torch models and has no TPU-native compute '
            f'path; use a native backbone instead of timm:{self.model_name}')
