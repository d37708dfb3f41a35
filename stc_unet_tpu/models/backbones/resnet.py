"""ResNet / ResNetV1c / ResNetV1d backbones
(≙ reference ``mmseg/models/backbones/resnet.py``), flax NHWC.

Supports the mmseg dialect the configs use: ``depth`` 18/34/50/101/152,
``strides``/``dilations`` per stage (dilated stages for DeepLab-style
output-stride 8, reference ``my_config/PSPNet.py:10-11``),
``contract_dilation`` (first block of a dilated stage halves its dilation),
``style='pytorch'|'caffe'`` (stride on conv2 vs conv1 of a bottleneck),
``deep_stem``/``avg_down`` (V1c/V1d), ``out_indices``. ``norm_eval`` /
``frozen_stages`` are accepted; freezing is applied by the optimizer mask in
this functional design (parameters carry no ``requires_grad``).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import BatchNorm, Conv2d, max_pool2d, avg_pool2d
from ..builder import BACKBONES


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (expansion 1)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv2d(self.planes, 3, self.stride, padding=self.dilation,
                     dilation=self.dilation, use_bias=False, name='conv1')(x)
        out = BatchNorm(name='bn1')(out, train=train)
        out = nn.relu(out)
        out = Conv2d(self.planes, 3, 1, padding=1, use_bias=False,
                     name='conv2')(out)
        out = BatchNorm(name='bn2')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 residual block (expansion 4)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = 'pytorch'
    avg_down: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.style == 'pytorch':
            conv1_stride, conv2_stride = 1, self.stride
        else:  # caffe
            conv1_stride, conv2_stride = self.stride, 1
        identity = x
        out = Conv2d(self.planes, 1, conv1_stride, use_bias=False,
                     name='conv1')(x)
        out = BatchNorm(name='bn1')(out, train=train)
        out = nn.relu(out)
        out = Conv2d(self.planes, 3, conv2_stride, padding=self.dilation,
                     dilation=self.dilation, use_bias=False,
                     name='conv2')(out)
        out = BatchNorm(name='bn2')(out, train=train)
        out = nn.relu(out)
        out = Conv2d(self.planes * self.expansion, 1, use_bias=False,
                     name='conv3')(out)
        out = BatchNorm(name='bn3')(out, train=train)
        if self.downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down, train)
        return nn.relu(out + identity)


class _Downsample(nn.Module):
    out_ch: int
    stride: int
    avg_down: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.avg_down and self.stride > 1:
            # reference res_layer.py:50-54: AvgPool2d(ceil_mode=True,
            # count_include_pad=False) — ceil by padding bottom/right, the
            # divisor counting only valid elements
            s = self.stride
            ph = (s - x.shape[1] % s) % s
            pw = (s - x.shape[2] % s) % s
            if ph or pw:
                import jax as _jax
                import jax.numpy as _jnp
                pad4 = ((0, 0), (0, ph), (0, pw), (0, 0))
                summed = _jax.lax.reduce_window(
                    x, 0.0, _jax.lax.add, (1, s, s, 1), (1, s, s, 1), pad4)
                ones = _jnp.ones(x.shape[:3] + (1,), x.dtype)
                counts = _jax.lax.reduce_window(
                    ones, 0.0, _jax.lax.add, (1, s, s, 1), (1, s, s, 1),
                    pad4)
                x = summed / counts
            else:
                x = avg_pool2d(x, s, s, count_include_pad=False)
            x = Conv2d(self.out_ch, 1, 1, use_bias=False, name='0')(x)
        else:
            x = Conv2d(self.out_ch, 1, self.stride, use_bias=False,
                       name='0')(x)
        return BatchNorm(name='1')(x, train=train)


def _downsample(x, out_ch, stride, avg_down, train):
    return _Downsample(out_ch, stride, avg_down, name='downsample')(
        x, train=train)


class ResLayer(nn.Module):
    """A stage of residual blocks (≙ mmseg ``ResLayer``,
    ``models/utils/res_layer.py:7``)."""
    block: type
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    style: str = 'pytorch'
    avg_down: bool = False
    contract_dilation: bool = False
    multi_grid: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            if self.multi_grid is not None:
                # reference res_layer.py:73,92: multi_grid[i] IS the
                # dilation of block i (not a multiplier on the stage rate)
                dilation = self.multi_grid[i]
            elif i == 0 and self.dilation > 1 and self.contract_dilation:
                dilation = self.dilation // 2
            else:
                dilation = self.dilation
            stride = self.stride if i == 0 else 1
            in_ch = x.shape[-1]
            needs_ds = (i == 0 and
                        (stride != 1 or
                         in_ch != self.planes * self.block.expansion))
            x = self.block(self.planes, stride=stride, dilation=dilation,
                           downsample=needs_ds, style=self.style,
                           avg_down=self.avg_down, name=f'{i}')(
                x, train=train) if self.block is Bottleneck else \
                self.block(self.planes, stride=stride, dilation=dilation,
                           downsample=needs_ds, avg_down=self.avg_down,
                           name=f'{i}')(x, train=train)
        return x


@BACKBONES.register_module()
class ResNet(nn.Module):
    """ResNet backbone (reference ``backbones/resnet.py``, 714 LoC)."""

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = 'pytorch'
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    norm_eval: bool = False
    contract_dilation: bool = False
    multi_grid: Optional[Sequence[int]] = None
    with_cp: bool = False
    zero_init_residual: bool = True
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dcn: Optional[dict] = None
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    plugins: Optional[list] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # fail at CONSTRUCTION like the reference's asserts
        # (``resnet.py`` test contract: tests/test_backbones/test_resnet.py)
        # — flax modules otherwise defer everything to first init/apply,
        # which would silently truncate stages or ignore a bad style.
        if self.depth not in self.arch_settings:
            raise KeyError(f'invalid depth {self.depth} for '
                           f'{type(self).__name__}')
        assert 1 <= self.num_stages <= 4, \
            f'num_stages must be in [1, 4], got {self.num_stages}'
        assert len(self.strides) == len(self.dilations) == self.num_stages, \
            (f'strides ({len(self.strides)}) and dilations '
             f'({len(self.dilations)}) must match num_stages '
             f'({self.num_stages})')
        assert self.style in ('pytorch', 'caffe'), \
            f"style must be 'pytorch' or 'caffe', got {self.style!r}"
        if self.pretrained is not None and \
                not isinstance(self.pretrained, str):
            raise TypeError('pretrained must be a str path or None, '
                            f'got {type(self.pretrained).__name__}')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False, icnet_cascade: bool = False,
                 icnet_align_corners: bool = False):
        """``icnet_cascade=True`` reproduces the reference ICNet's use of
        this trunk (icnet.py:73-75,141-148): ceil-mode stem max-pool, and
        the layer2 feature bilinearly halved before layer3 runs."""
        block, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]

        if self.deep_stem:
            mid = self.stem_channels // 2
            for j, (ch, s) in enumerate([(mid, 2), (mid, 1),
                                         (self.stem_channels, 1)]):
                x = Conv2d(ch, 3, s, padding=1, use_bias=False,
                           name=f'stem_conv{j}')(x)
                x = BatchNorm(name=f'stem_bn{j}')(x, train=train)
                x = nn.relu(x)
        else:
            x = Conv2d(self.stem_channels, 7, 2, padding=3, use_bias=False,
                       name='conv1')(x)
            x = BatchNorm(name='bn1')(x, train=train)
            x = nn.relu(x)
        x = max_pool2d(x, 3, 2, padding=1, ceil_mode=icnet_cascade)

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            if icnet_cascade and i == 2:
                from stc_unet_tpu.ops import resize as _resize
                x = _resize(x, scale_factor=0.5, mode='bilinear',
                            align_corners=icnet_align_corners,
                            warning=False)
            planes = self.base_channels * 2**i
            multi_grid = self.multi_grid if i == len(stage_blocks) - 1 \
                else None
            x = ResLayer(block, planes, num_blocks,
                         stride=self.strides[i],
                         dilation=self.dilations[i], style=self.style,
                         avg_down=self.avg_down,
                         contract_dilation=self.contract_dilation,
                         multi_grid=multi_grid,
                         name=f'layer{i + 1}')(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return outs


@BACKBONES.register_module()
class ResNetV1c(ResNet):
    """ResNet with a deep 3x3 stem (reference ``resnet.py`` V1c)."""
    deep_stem: bool = True
    avg_down: bool = False


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """Deep stem + avg-pool downsampling (reference ``resnet.py`` V1d)."""
    deep_stem: bool = True
    avg_down: bool = True
