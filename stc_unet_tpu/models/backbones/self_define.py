"""Author's extra registered backbones (≙ reference
``backbones/self_define.py:12`` — a 17-line experimentation stub — and
``backbones/cls_resnet.py:40`` ClsResNet18; both registered but unused by
any config, kept for registry parity)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from ..bricks import BatchNorm, Conv2d, max_pool2d
from ..builder import BACKBONES
from .resnet import ResNet


@BACKBONES.register_module()
class Self_Define_Backbone(nn.Module):
    """Minimal conv stack scaffold for quick experiments."""
    in_channels: int = 3
    out_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_channels, 3, 2, padding=1, name='conv1')(x)
        x = BatchNorm(name='bn1')(x, train=train)
        x = nn.relu(x)
        return [x]


@BACKBONES.register_module()
class ClsResNet18(ResNet):
    """ResNet-18 trunk exposed under the author's classification alias."""
    depth: int = 18
