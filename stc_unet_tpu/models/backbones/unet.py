"""Stock UNet backbone (≙ reference ``backbones/unet.py:225`` with
``BasicConvBlock:16``, ``DeconvModule:90``, ``InterpConv:151`` and
``models/utils/up_conv_block.py:7``).

The zoo's ``fcn_unet_s5-d16`` family builds on this (BASELINE.md rows). The
forward returns encoder bottom + all decoder outputs (finest last), exactly
like the reference.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, ConvModule, max_pool2d
from ..builder import BACKBONES


class BasicConvBlock(nn.Module):
    """num_convs stacked ConvModules; first may stride/dilate
    (reference ``unet.py:16``)."""
    out_channels: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dcn: Optional[dict] = None
    plugins: Optional[list] = None

    def __post_init__(self):
        # reference ``unet.py:44-45``: neither is implemented there
        assert self.dcn is None, 'Not implemented yet.'
        assert self.plugins is None, 'Not implemented yet.'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            stride = self.stride if i == 0 else 1
            dilation = 1 if i == 0 else self.dilation
            x = ConvModule(self.out_channels, 3, stride=stride,
                           dilation=dilation,
                           padding=1 if i == 0 else dilation,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'convs_{i}')(x, train=train)
        return x


class DeconvModule(nn.Module):
    """ConvTranspose upsample + norm + act (reference ``unet.py:90``)."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    kernel_size: int = 4
    scale_factor: int = 2

    def __post_init__(self):
        # reference ``unet.py:103-108``: kernel >= scale and the overlap
        # (kernel - scale) must be even for an artifact-free deconv
        assert (self.kernel_size - self.scale_factor >= 0
                and (self.kernel_size - self.scale_factor) % 2 == 0), \
            (f'kernel_size ({self.kernel_size}) must be >= scale_factor '
             f'({self.scale_factor}) and their difference even')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel_size, self.scale_factor
        assert (k - s >= 0) and (k - s) % 2 == 0
        p = (k - s) // 2
        y = nn.ConvTranspose(self.out_channels, (k, k), strides=(s, s),
                             padding='VALID', dtype=x.dtype,
                             name='deconv')(x)
        if p:
            y = y[:, p:y.shape[1] - p, p:y.shape[2] - p, :]
        y = BatchNorm(name='norm')(y, train=train)
        return nn.relu(y)


class InterpConv(nn.Module):
    """Bilinear upsample + 1x1 conv, either order (reference ``unet.py:151``)."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    conv_first: bool = False
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    upsample_cfg: dict = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        up_cfg = self.upsample_cfg or dict(scale_factor=2, mode='bilinear',
                                           align_corners=False)
        conv = ConvModule(self.out_channels, self.kernel_size, self.stride,
                          self.padding, norm_cfg=self.norm_cfg,
                          act_cfg=self.act_cfg, name='conv')

        def _up(x):
            # align_corners must stay absent for nearest mode (torch
            # F.interpolate contract carried by ops.resize)
            return resize(x, scale_factor=up_cfg.get('scale_factor', 2),
                          mode=up_cfg.get('mode', 'bilinear'),
                          align_corners=up_cfg.get('align_corners', None),
                          warning=False)

        if self.conv_first:
            x = _up(conv(x, train=train))
        else:
            x = conv(_up(x), train=train)
        return x


_UPSAMPLE = {'InterpConv': InterpConv, 'DeconvModule': DeconvModule}


class UpConvBlock(nn.Module):
    """Upsample low-res input, concat skip, conv block
    (reference ``models/utils/up_conv_block.py:7``)."""
    skip_channels: int
    out_channels: int
    num_convs: int = 2
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    dcn: Optional[dict] = None
    plugins: Optional[list] = None

    def __post_init__(self):
        # reference ``up_conv_block.py:64-65``: neither is implemented
        assert self.dcn is None, 'Not implemented yet.'
        assert self.plugins is None, 'Not implemented yet.'
        super().__post_init__()

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        if self.upsample_cfg is not None:
            cfg = dict(self.upsample_cfg)
            up_type = cfg.pop('type')
            x = _UPSAMPLE[up_type](self.skip_channels,
                                   norm_cfg=self.norm_cfg,
                                   act_cfg=self.act_cfg, name='upsample',
                                   **cfg)(x, train=train)
        else:
            # no upsample (the matching encoder stage kept resolution):
            # plain 1x1 channel-matching conv (reference up_conv_block.py:97)
            x = ConvModule(self.skip_channels, 1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg, name='upsample')(
                x, train=train)
        x = jnp.concatenate([skip, x], axis=-1)
        return BasicConvBlock(self.out_channels, self.num_convs,
                              stride=1, dilation=self.dilation,
                              norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                              name='conv_block')(x, train=train)


@BACKBONES.register_module()
class UNet(nn.Module):
    """Stock 5-stage UNet (reference ``unet.py:225``)."""
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    with_cp: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    norm_eval: bool = False
    dcn: Optional[dict] = None
    plugins: Optional[list] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # the reference's constructor asserts
        # (``unet.py:316-340`` / tests/test_backbones/test_unet.py):
        # per-stage sequences must match num_stages; dcn/plugins are not
        # implemented there either.
        n = self.num_stages
        assert len(self.strides) == n, \
            f'len(strides) ({len(self.strides)}) != num_stages ({n})'
        assert len(self.enc_num_convs) == n, \
            (f'len(enc_num_convs) ({len(self.enc_num_convs)}) != '
             f'num_stages ({n})')
        assert len(self.dec_num_convs) == n - 1, \
            (f'len(dec_num_convs) ({len(self.dec_num_convs)}) != '
             f'num_stages - 1 ({n - 1})')
        assert len(self.downsamples) == n - 1, \
            (f'len(downsamples) ({len(self.downsamples)}) != '
             f'num_stages - 1 ({n - 1})')
        assert len(self.enc_dilations) == n, \
            (f'len(enc_dilations) ({len(self.enc_dilations)}) != '
             f'num_stages ({n})')
        assert len(self.dec_dilations) == n - 1, \
            (f'len(dec_dilations) ({len(self.dec_dilations)}) != '
             f'num_stages - 1 ({n - 1})')
        assert self.dcn is None, 'DCN is not implemented (reference parity)'
        assert self.plugins is None, \
            'plugins are not implemented (reference parity)'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        up_cfg = self.upsample_cfg or dict(type='InterpConv')
        # input must be divisible by the whole downsample rate (reference
        # ``unet.py:341-350``) — shapes are static under jit, so this is a
        # trace-time check, free at run time
        rate = 1
        for i in range(1, self.num_stages):
            if self.strides[i] == 2 or self.downsamples[i - 1]:
                rate *= 2
        h, w = x.shape[1], x.shape[2]
        assert h % rate == 0 and w % rate == 0, \
            (f'input ({h}, {w}) is not divisible by the whole downsample '
             f'rate {rate} of the encoder (strides={tuple(self.strides)}, '
             f'downsamples={tuple(self.downsamples)})')
        enc_outs = []
        for i in range(self.num_stages):
            # pool only when the stage itself does not stride
            # (reference unet.py:352-356)
            if i > 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                x = max_pool2d(x, 2)
            x = BasicConvBlock(
                self.base_channels * 2**i, self.enc_num_convs[i],
                stride=self.strides[i], dilation=self.enc_dilations[i],
                norm_cfg=norm_cfg, act_cfg=act_cfg,
                name=f'encoder_{i}')(x, train=train)
            enc_outs.append(x)
        dec_outs = [x]
        for i in reversed(range(self.num_stages - 1)):
            upsample = (self.strides[i + 1] != 1 or self.downsamples[i])
            x = UpConvBlock(
                skip_channels=self.base_channels * 2**i,
                out_channels=self.base_channels * 2**i,
                num_convs=self.dec_num_convs[i],
                dilation=self.dec_dilations[i], norm_cfg=norm_cfg,
                act_cfg=act_cfg,
                upsample_cfg=up_cfg if upsample else None,
                name=f'decoder_{i}')(enc_outs[i], x, train=train)
            dec_outs.append(x)
        return dec_outs
