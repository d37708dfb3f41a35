"""InvertedResidual blocks (≙ reference ``models/utils/inverted_residual.py:9,102``)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import ConvModule


def make_divisible(value, divisor=8, min_value=None, min_ratio=0.9):
    """mmcv make_divisible."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand 1x1 → dw 3x3 → project 1x1)."""
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    def __post_init__(self):
        # ≙ reference ``inverted_residual.py:9`` ctor assert
        # (tests/test_backbones/test_blocks.py:24-26)
        assert self.stride in (1, 2), \
            f'stride must be in [1, 2], got {self.stride}'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU6')
        use_res = self.stride == 1 and in_ch == self.out_channels
        y = x
        if self.expand_ratio != 1:
            y = ConvModule(hidden, 1, norm_cfg=norm_cfg, act_cfg=act_cfg,
                           name='expand_conv')(y, train=train)
        y = ConvModule(hidden, 3, stride=self.stride,
                       padding=self.dilation, dilation=self.dilation,
                       groups=hidden, norm_cfg=norm_cfg, act_cfg=act_cfg,
                       name='depthwise_conv')(y, train=train)
        y = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, name='linear_conv')(y, train=train)
        return x + y if use_res else y


class InvertedResidualV3(nn.Module):
    """MobileNetV3 inverted residual with optional SE and h-swish.

    ``stride`` is the ARCH stride: it decides the residual shortcut and
    whether the depthwise conv uses TF-style adaptive ('SAME') padding,
    exactly like the reference (``inverted_residual.py:142,170-171`` — a
    stride-2 block gets Conv2dAdaptivePadding and never a shortcut).
    ``dw_stride``/``dilation`` carry mmseg's post-construction segmentation
    surgery (``mobilenet_v3.py:199-241``): the conv's stride/dilation are
    overridden while shortcut and padding-mode decisions keep the arch
    stride.
    """
    out_channels: int
    mid_channels: int
    kernel_size: int = 3
    stride: int = 1
    se_ratio: Optional[float] = None
    with_expand_conv: bool = True
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dilation: int = 1
    dw_stride: Optional[int] = None

    def __post_init__(self):
        # ≙ reference ``inverted_residual.py:102`` ctor assert
        # (tests/test_backbones/test_blocks.py:67-69)
        assert self.stride in (1, 2), \
            f'stride must be in [1, 2], got {self.stride}'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        # without an expand conv the depthwise conv runs on the input
        # directly, so mid_channels must equal in_channels (reference
        # ``inverted_residual.py:102`` ctor assert; checked lazily here
        # because in_channels is inferred from the input in this framework)
        if not self.with_expand_conv:
            assert self.mid_channels == in_ch, \
                'mid_channels must equal in_channels when ' \
                'with_expand_conv is False'
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        use_res = self.stride == 1 and in_ch == self.out_channels
        y = x
        if self.with_expand_conv:
            y = ConvModule(self.mid_channels, 1, norm_cfg=norm_cfg,
                           act_cfg=act_cfg, name='expand_conv')(y,
                                                                train=train)
        # adaptive ('SAME') padding for arch-stride-2 blocks: asymmetric
        # bottom/right pad at stride 2, symmetric (k-1)*d/2 once the
        # surgery sets the stride back to 1 — both match torch's
        # Conv2dAdaptivePadding
        pad = 'SAME' if self.stride == 2 \
            else self.dilation * (self.kernel_size // 2)
        y = ConvModule(self.mid_channels, self.kernel_size,
                       stride=self.dw_stride or self.stride,
                       padding=pad, dilation=self.dilation,
                       groups=self.mid_channels, norm_cfg=norm_cfg,
                       act_cfg=act_cfg, name='depthwise_conv')(y,
                                                               train=train)
        if self.se_ratio:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            rd = make_divisible(self.mid_channels * self.se_ratio)
            from ..bricks import Conv2d, h_sigmoid
            s = nn.relu(Conv2d(rd, 1, name='se_reduce')(s))
            s = h_sigmoid(Conv2d(self.mid_channels, 1, name='se_expand')(s))
            y = y * s
        y = ConvModule(self.out_channels, 1, norm_cfg=norm_cfg,
                       act_cfg=None, name='linear_conv')(y, train=train)
        return x + y if use_res else y


class SELayer(nn.Module):
    """Squeeze-and-excite (reference ``models/utils/se_layer.py:9``).

    ``act_cfg`` may be one dict (used for both gates) or a 2-tuple of
    dicts (reduce-act, expand-act), exactly like the reference.
    """
    ratio: int = 16
    act_cfg: object = (dict(type='ReLU'),
                       dict(type='HSigmoid'))

    def __post_init__(self):
        # ≙ reference ``se_layer.py:9`` ctor asserts
        # (tests/test_backbones/test_blocks.py:154-156). Mapping, not dict:
        # flax's clone-on-init wraps dict attributes in FrozenDict.
        from collections.abc import Mapping
        if not isinstance(self.act_cfg, Mapping):
            assert len(self.act_cfg) == 2, \
                'act_cfg must be a dict or a 2-tuple of dicts'
            assert all(isinstance(c, Mapping) for c in self.act_cfg), \
                'act_cfg entries must be dicts'
        super().__post_init__()

    @nn.compact
    def __call__(self, x):
        from collections.abc import Mapping

        from ..bricks import Conv2d, build_activation_layer
        act_cfg = self.act_cfg
        if isinstance(act_cfg, Mapping):
            act_cfg = (act_cfg, act_cfg)
        act1 = build_activation_layer(act_cfg[0])
        act2 = build_activation_layer(act_cfg[1])
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = act1(Conv2d(make_divisible(c // self.ratio, 8), 1,
                        name='conv1')(s))
        s = act2(Conv2d(c, 1, name='conv2')(s))
        return x * s
