"""UNet++ head (≙ reference ``decode_heads/unetpp_head.py:12``).

The reference delegates to ``segmentation_models_pytorch``'s
``smp.UnetPlusPlus(encoder_name='vgg16', classes=64)`` then applies
``cls_seg``. Rebuilt natively: a VGG16 conv encoder + the nested dense-skip
UNet++ decoder (Zhou et al.) — no external model zoo dependency, and the
dense-skip grid is pure conv/concat/resize (fuses cleanly under XLA).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead

_VGG16_CFG = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
              (512, 512, 512))


class VGG16Encoder(nn.Module):
    """VGG16-BN feature encoder: 5 stages, maxpool between stages.

    Returns [f0@/1 (64), f1@/2 (128), f2@/4 (256), f3@/8 (512),
    f4@/16 (512)].
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        for si, stage in enumerate(_VGG16_CFG):
            if si > 0:
                x = max_pool2d(x, 2)
            for ci, ch in enumerate(stage):
                x = Conv2d(ch, 3, padding=1, name=f's{si}_conv{ci}')(x)
                x = BatchNorm(name=f's{si}_bn{ci}')(x, train=train)
                x = nn.relu(x)
            feats.append(x)
        return feats


class UppBlock(nn.Module):
    """conv3x3-BN-relu x2 on the concatenated dense skips."""
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_ch, 3, padding=1, use_bias=False,
                   name='conv0')(x)
        x = nn.relu(BatchNorm(name='bn0')(x, train=train))
        x = Conv2d(self.out_ch, 3, padding=1, use_bias=False,
                   name='conv1')(x)
        x = nn.relu(BatchNorm(name='bn1')(x, train=train))
        return x


@HEADS.register_module()
class UnetPlusPlus(BaseDecodeHead):
    """Nested UNet++ over the VGG16 encoder; final 3x3 conv to
    ``head_classes`` (=64 in the reference config) then ``cls_seg``."""
    deep_supervision: bool = False
    head_classes: int = 64
    decoder_row_channels: Sequence[int] = (16, 32, 64, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = VGG16Encoder(name='encoder')(x, train=train)
        levels = len(feats)  # 5
        rc = list(self.decoder_row_channels)
        # X[i][j]: row i (scale /2^i), column j of the nested grid
        grid = {(i, 0): feats[i] for i in range(levels)}
        for j in range(1, levels):
            for i in range(levels - j):
                below = grid[(i + 1, j - 1)]
                up = resize(below, size=grid[(i, 0)].shape[1:3],
                            mode='bilinear', align_corners=False,
                            warning=False)
                cat = jnp.concatenate(
                    [grid[(i, k)] for k in range(j)] + [up], axis=-1)
                grid[(i, j)] = UppBlock(rc[i],
                                        name=f'x_{i}_{j}')(cat, train=train)
        out = Conv2d(self.head_classes, 3, padding=1, name='final_conv')(
            grid[(0, levels - 1)])
        return self.cls_seg(out, train=train)
