"""ResNeXt + ResNeSt backbones (≙ reference ``backbones/resnext.py`` (150)
and ``backbones/resnest.py`` (318))."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import math

import jax.numpy as jnp

from ..bricks import BatchNorm, Conv2d, avg_pool2d
from ..builder import BACKBONES
from .resnet import ResNet, _downsample


class GroupBottleneck(nn.Module):
    """ResNeXt bottleneck: grouped 3x3 conv with width scaling."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = 'pytorch'
    avg_down: bool = False
    groups: int = 32
    base_width: int = 4
    base_channels: int = 64

    expansion = 4

    def __post_init__(self):
        # ≙ reference Bottleneck ctor contract shared by BottleneckX
        # (tests/test_backbones/test_resnext.py:11-13)
        assert self.style in ('pytorch', 'caffe'), \
            f"style must be 'pytorch' or 'caffe', got {self.style!r}"
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference resnext.py:28-32: width = planes when groups == 1; the
        # base_width formula only applies to grouped variants. Static python
        # math so the shape stays concrete under jit.
        if self.groups == 1:
            width = self.planes
        else:
            width = int(math.floor(
                self.planes * (self.base_width / self.base_channels))
            ) * self.groups
        if self.style == 'pytorch':
            conv1_stride, conv2_stride = 1, self.stride
        else:
            conv1_stride, conv2_stride = self.stride, 1
        identity = x
        out = Conv2d(width, 1, conv1_stride, use_bias=False,
                     name='conv1')(x)
        out = nn.relu(BatchNorm(name='bn1')(out, train=train))
        out = Conv2d(width, 3, conv2_stride, padding=self.dilation,
                     dilation=self.dilation, groups=self.groups,
                     use_bias=False, name='conv2')(out)
        out = nn.relu(BatchNorm(name='bn2')(out, train=train))
        out = Conv2d(self.planes * self.expansion, 1, use_bias=False,
                     name='conv3')(out)
        out = BatchNorm(name='bn3')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """ResNeXt: ResNet with grouped bottlenecks."""
    groups: int = 1
    base_width: int = 4

    arch_settings = {
        50: (GroupBottleneck, (3, 4, 6, 3)),
        101: (GroupBottleneck, (3, 4, 23, 3)),
        152: (GroupBottleneck, (3, 8, 36, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..bricks import max_pool2d
        block, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        x = Conv2d(self.stem_channels, 7, 2, padding=3, use_bias=False,
                   name='conv1')(x)
        x = nn.relu(BatchNorm(name='bn1')(x, train=train))
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                dilation = self.dilations[i]
                if j == 0 and dilation > 1 and self.contract_dilation:
                    dilation = dilation // 2
                in_ch = x.shape[-1]
                needs_ds = (j == 0 and
                            (stride != 1 or
                             in_ch != planes * block.expansion))
                x = block(planes, stride=stride, dilation=dilation,
                          downsample=needs_ds, style=self.style,
                          avg_down=self.avg_down, groups=self.groups,
                          base_width=self.base_width,
                          base_channels=self.base_channels,
                          name=f'layer{i + 1}_{j}')(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return outs


class SplitAttentionConv(nn.Module):
    """Split-attention grouped conv (ResNeSt)."""
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.channels
        inter = max(x.shape[-1] * r // self.reduction_factor, 32)
        out = Conv2d(c * r, self.kernel_size, self.stride,
                     padding=self.dilation, dilation=self.dilation,
                     groups=self.groups * r, use_bias=False,
                     name='conv')(x)
        out = nn.relu(BatchNorm(name='bn0')(out, train=train))
        b, h, w, _ = out.shape
        splits = out.reshape(b, h, w, r, c)
        gap = splits.sum(axis=3).mean(axis=(1, 2), keepdims=True)
        gap = Conv2d(inter, 1, groups=self.groups, name='fc1')(gap)
        gap = nn.relu(BatchNorm(name='bn1')(gap, train=train))
        atten = Conv2d(c * r, 1, groups=self.groups, name='fc2')(gap)
        if r > 1:
            # reference RSoftmax (resnest.py:29-34): the fc2 output is
            # GROUP-major (g, r, c/g); view → transpose → softmax over
            # radix → flatten back to (r, g, c/g), matching the conv
            # output's radix-major chunking
            g = self.groups
            atten = atten.reshape(b, 1, 1, g, r, c // g)
            atten = jax.nn.softmax(atten, axis=4)
            atten = atten.transpose(0, 1, 2, 4, 3, 5).reshape(b, 1, 1, r, c)
        else:
            # radix == 1: sigmoid gate (reference resnest.py:35)
            atten = nn.sigmoid(atten).reshape(b, 1, 1, r, c)
        return (splits * atten).sum(axis=3)


class SplitBottleneck(nn.Module):
    """ResNeSt bottleneck with split-attention conv + avg-pool strides."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = 'pytorch'
    avg_down: bool = True
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    radix: int = 2
    avg_down_stride: bool = True

    expansion = 4

    def __post_init__(self):
        # ≙ reference BottleneckS ctor contract
        # (tests/test_backbones/test_resnest.py:10-12)
        assert self.style in ('pytorch', 'caffe'), \
            f"style must be 'pytorch' or 'caffe', got {self.style!r}"
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference resnest.py:180-184: width = planes when groups == 1
        # (the default for every ResNeSt config); the base_width formula
        # only applies to grouped variants. Static python math so the shape
        # stays concrete under jit.
        if self.groups == 1:
            width = self.planes
        else:
            width = int(math.floor(
                self.planes * (self.base_width / self.base_channels))
            ) * self.groups
        identity = x
        out = Conv2d(width, 1, 1, use_bias=False, name='conv1')(x)
        out = nn.relu(BatchNorm(name='bn1')(out, train=train))
        use_avg = self.avg_down_stride and self.stride > 1
        out = SplitAttentionConv(width, 3, 1 if use_avg else self.stride,
                                 dilation=self.dilation,
                                 groups=self.groups, radix=self.radix,
                                 name='conv2')(out, train=train)
        if use_avg:
            out = avg_pool2d(out, 3, self.stride, padding=1)
        out = Conv2d(self.planes * self.expansion, 1, use_bias=False,
                     name='conv3')(out)
        out = BatchNorm(name='bn3')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, True, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeSt(ResNeXt):
    """ResNeSt: split-attention networks."""
    radix: int = 2
    reduction_factor: int = 4
    avg_down_stride: bool = True
    deep_stem: bool = True
    avg_down: bool = True

    arch_settings = {
        50: (SplitBottleneck, (3, 4, 6, 3)),
        101: (SplitBottleneck, (3, 4, 23, 3)),
        152: (SplitBottleneck, (3, 8, 36, 3)),
        200: (SplitBottleneck, (3, 24, 36, 3)),
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..bricks import max_pool2d
        block, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        mid = self.stem_channels // 2
        for j, (ch, s) in enumerate([(mid, 2), (mid, 1),
                                     (self.stem_channels, 1)]):
            x = Conv2d(ch, 3, s, padding=1, use_bias=False,
                       name=f'stem_conv{j}')(x)
            x = nn.relu(BatchNorm(name=f'stem_bn{j}')(x, train=train))
        x = max_pool2d(x, 3, 2, padding=1)
        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                dilation = self.dilations[i]
                if j == 0 and dilation > 1 and self.contract_dilation:
                    dilation = dilation // 2
                in_ch = x.shape[-1]
                needs_ds = (j == 0 and
                            (stride != 1 or
                             in_ch != planes * block.expansion))
                x = block(planes, stride=stride, dilation=dilation,
                          downsample=needs_ds, groups=self.groups,
                          base_width=self.base_width,
                          base_channels=self.base_channels,
                          radix=self.radix,
                          avg_down_stride=self.avg_down_stride,
                          name=f'layer{i + 1}_{j}')(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return outs
