"""Extra live-registered monolithic U-Net heads from the reference fork.

- :class:`ResUNet` ≙ reference ``decode_heads/resunet_decoder.py:11``
- :class:`LinkNet` ≙ reference ``decode_heads/linknet.py:88`` (resnet18
  encoder inlined; the reference pulls it from timm)
- :class:`MultiResUnet` ≙ reference ``decode_heads/MultiResUnet_head.py:122``

Like the other fork-specific heads (``dc_unet_head.py`` etc.) these take the
image itself (identity backbone / ``EncoderDecoderFull``) and return logits
NHWC. Reference quirks replicated on purpose: ResUNet's hardwired 2-channel
sigmoid output, LinkNet's log-softmax output, MultiResUnet's affine-free
BatchNorms, its double application of the same BN module inside
``Multiresblock``, and its weight-shared Respath chain.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import BatchNorm, Conv2d, ConvTranspose2d, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead


# --------------------------------------------------------------------------
# ResUNet (reference resunet_decoder.py)
# --------------------------------------------------------------------------

class ResidualConv(nn.Module):
    """BN→relu→conv3x3(s)→BN→relu→conv3x3 + conv3x3(s)+BN skip
    (reference ``resunet_decoder.py:77``)."""
    features: int
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BatchNorm(name='bn1')(x, train=train)
        h = nn.relu(h)
        h = Conv2d(self.features, 3, stride=self.stride,
                   padding=self.padding, name='conv1')(h)
        h = BatchNorm(name='bn2')(h, train=train)
        h = nn.relu(h)
        h = Conv2d(self.features, 3, padding=1, name='conv2')(h)
        skip = Conv2d(self.features, 3, stride=self.stride, padding=1,
                      name='skip_conv')(x)
        skip = BatchNorm(name='skip_bn')(skip, train=train)
        return h + skip


@HEADS.register_module()
class ResUNet(BaseDecodeHead):
    """3-level residual U-Net (reference ``resunet_decoder.py:11``).

    Output is a hardwired 2-channel sigmoid map — the reference ignores
    ``num_classes`` in its output layer; replicated faithfully.
    """
    filters: Sequence[int] = (64, 128, 256, 512)
    channel: int = 1  # reference ctor arg (input channels; shape-inferred)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.filters)
        # input layer: conv→BN→relu→conv, plus a bare conv skip
        h = Conv2d(f[0], 3, padding=1, name='in_conv1')(x)
        h = BatchNorm(name='in_bn')(h, train=train)
        h = nn.relu(h)
        h = Conv2d(f[0], 3, padding=1, name='in_conv2')(h)
        x1 = h + Conv2d(f[0], 3, padding=1, name='in_skip')(x)

        x2 = ResidualConv(f[1], stride=2, name='res1')(x1, train=train)
        x3 = ResidualConv(f[2], stride=2, name='res2')(x2, train=train)
        x4 = ResidualConv(f[3], stride=2, name='bridge')(x3, train=train)

        up = ConvTranspose2d(f[3], 2, 2, name='up1')(x4)
        d = ResidualConv(f[2], name='up_res1')(
            jnp.concatenate([up, x3], axis=-1), train=train)
        up = ConvTranspose2d(f[2], 2, 2, name='up2')(d)
        d = ResidualConv(f[1], name='up_res2')(
            jnp.concatenate([up, x2], axis=-1), train=train)
        up = ConvTranspose2d(f[1], 2, 2, name='up3')(d)
        d = ResidualConv(f[0], name='up_res3')(
            jnp.concatenate([up, x1], axis=-1), train=train)
        return nn.sigmoid(Conv2d(2, 1, name='out_conv')(d))


# --------------------------------------------------------------------------
# LinkNet (reference linknet.py)
# --------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    """resnet18 BasicBlock (what ``timm.create_model('resnet18')`` layers
    contain): conv3x3(s)-bn-relu-conv3x3-bn (+1x1-s downsample), relu."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv2d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name='conv1')(x)
        h = BatchNorm(name='bn1')(h, train=train)
        h = nn.relu(h)
        h = Conv2d(self.features, 3, padding=1, use_bias=False,
                   name='conv2')(h)
        h = BatchNorm(name='bn2')(h, train=train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = Conv2d(self.features, 1, stride=self.stride, use_bias=False,
                       name='down_conv')(x)
            x = BatchNorm(name='down_bn')(x, train=train)
        return nn.relu(h + x)


class _LinkDecoder(nn.Module):
    """1x1 reduce (C/4) → ConvTranspose → 1x1 expand, each +BN+relu
    (reference ``linknet.py:63``)."""
    out_features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    output_padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        quarter = x.shape[-1] // 4
        h = Conv2d(quarter, 1, use_bias=False, name='conv1')(x)
        h = BatchNorm(name='bn1')(h, train=train)
        h = nn.relu(h)
        h = ConvTranspose2d(quarter, self.kernel, self.stride, self.padding,
                            self.output_padding, use_bias=False,
                            name='tp_conv')(h)
        h = BatchNorm(name='tp_bn')(h, train=train)
        h = nn.relu(h)
        h = Conv2d(self.out_features, 1, use_bias=False, name='conv2')(h)
        h = BatchNorm(name='bn2')(h, train=train)
        return nn.relu(h)


@HEADS.register_module()
class LinkNet(BaseDecodeHead):
    """LinkNet over an inline resnet18 encoder (reference ``linknet.py:88``).

    The reference instantiates the encoder via timm with ImageNet weights;
    here the encoder weights initialize randomly (load pretrained through
    ``init_cfg``/converters like every other backbone). Output is
    log-softmax over ``n_classes`` channels, as in the reference.
    """
    n_classes: int = 21

    @nn.compact
    def __call__(self, x, train: bool = False):
        # in_block: 7x7/s2 conv + BN + relu + 3x3/s2 maxpool
        h = Conv2d(64, 7, stride=2, padding=3, use_bias=False,
                   name='in_conv')(x)
        h = BatchNorm(name='in_bn')(h, train=train)
        h = nn.relu(h)
        stem = max_pool2d(h, 3, stride=2, padding=1)

        h = stem
        feats = []
        for i, (feat, s) in enumerate([(64, 1), (128, 2), (256, 2),
                                       (512, 2)]):
            h = _BasicBlock(feat, stride=s, name=f'enc{i + 1}_0')(
                h, train=train)
            h = _BasicBlock(feat, name=f'enc{i + 1}_1')(h, train=train)
            feats.append(h)
        e1, e2, e3, e4 = feats

        d4 = e3 + _LinkDecoder(256, 3, 2, 1, 1, name='decoder4')(
            e4, train=train)
        d3 = e2 + _LinkDecoder(128, 3, 2, 1, 1, name='decoder3')(
            d4, train=train)
        d2 = e1 + _LinkDecoder(64, 3, 2, 1, 1, name='decoder2')(
            d3, train=train)
        # decoder1 keeps resolution (s=1); its residual target is the
        # post-maxpool stem output (reference linknet.py:147)
        d1 = stem + _LinkDecoder(64, 3, 1, 1, 0, name='decoder1')(
            d2, train=train)

        y = ConvTranspose2d(32, 3, 2, 1, 1, name='tp_conv1')(d1)
        y = BatchNorm(name='tp_bn1')(y, train=train)
        y = nn.relu(y)
        y = Conv2d(32, 3, padding=1, name='conv2')(y)
        y = BatchNorm(name='bn2')(y, train=train)
        y = nn.relu(y)
        y = ConvTranspose2d(self.n_classes, 2, 2, name='tp_conv2')(y)
        return nn.log_softmax(y, axis=-1)


# --------------------------------------------------------------------------
# MultiResUnet (reference MultiResUnet_head.py)
# --------------------------------------------------------------------------

class Conv2dBN(nn.Module):
    """conv → BN(affine=False) → optional relu (reference ``:52``)."""
    features: int
    kernel_size: int = 2
    activation: str = 'relu'
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel_size, padding=self.padding,
                   name='conv1')(x)
        x = BatchNorm(affine=False, name='batchnorm')(x, train=train)
        return nn.relu(x) if self.activation == 'relu' else x


class Multiresblock(nn.Module):
    """3/5/7 effective-RF tower + 1x1 shortcut (reference ``:9``).

    The reference applies its single ``batch_norm1`` module twice (before
    and after the shortcut add) — replicated by reusing one BatchNorm
    instance, sharing stats/params exactly like torch shares the module.
    """
    unet_filters: int
    alpha: float = 1.67

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.unet_filters * self.alpha
        c3, c5, c7 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
        shortcut = Conv2dBN(c3 + c5 + c7, 1, activation='None',
                            name='conv2d_bn_1x1')(x, train=train)
        a = Conv2dBN(c3, 3, padding=1, name='conv2d_bn_3x3')(x, train=train)
        b = Conv2dBN(c5, 3, padding=1, name='conv2d_bn_5x5')(a, train=train)
        c = Conv2dBN(c7, 3, padding=1, name='conv2d_bn_7x7')(b, train=train)
        out = jnp.concatenate([a, b, c], axis=-1)
        bn = BatchNorm(affine=False, name='batch_norm1')
        out = bn(out, train=train)
        out = out + shortcut
        return bn(out, train=train)


def mrb_out_channels(unet_filters: int, alpha: float = 1.67) -> int:
    w = unet_filters * alpha
    return int(w * 0.167) + int(w * 0.333) + int(w * 0.5)


class Respath(nn.Module):
    """Residual skip-path chain (reference ``:81``). The loop applies the
    SAME 1x1/3x3 'common' blocks ``respath_length`` times (weight sharing in
    the reference) — replicated with shared flax submodules."""
    filters: int
    respath_length: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = Conv2dBN(self.filters, 1, activation='None',
                            name='conv2d_bn_1x1')(x, train=train)
        x = Conv2dBN(self.filters, 3, padding=1,
                     name='conv2d_bn_3x3')(x, train=train)
        bn = BatchNorm(affine=False, name='batch_norm1')
        x = bn(nn.relu(x + shortcut), train=train)
        if self.respath_length > 1:
            common1 = Conv2dBN(self.filters, 1, activation='None',
                               name='conv2d_bn_1x1_common')
            common3 = Conv2dBN(self.filters, 3, padding=1,
                               name='conv2d_bn_3x3_common')
            for _ in range(self.respath_length):
                shortcut = common1(x, train=train)
                x = common3(x, train=train)
                x = bn(nn.relu(x + shortcut), train=train)
        return x


@HEADS.register_module()
class MultiResUnet(BaseDecodeHead):
    """MultiResUNet (reference ``MultiResUnet_head.py:122``).

    ``channels`` = input-image channels in the reference ctor (shape is
    inferred here); ``nclasses`` drives the output conv — when 1 the
    output is sigmoid'd, as in the reference.
    """
    filters: int = 32
    nclasses: int = 1
    alpha: float = 1.67

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        skips = []
        for i, (mult, length) in enumerate([(1, 4), (2, 3), (4, 2), (8, 1)]):
            x_m = Multiresblock(f * mult,
                                name=f'multiresblock{i + 1}')(x, train=train)
            x = max_pool2d(x_m, 2)
            skips.append(Respath(f * mult, length,
                                 name=f'respath{i + 1}')(x_m, train=train))
        x = Multiresblock(f * 16, name='multiresblock5')(x, train=train)
        for i, mult in enumerate([8, 4, 2, 1]):
            up = ConvTranspose2d(f * mult, 2, 2,
                                 name=f'upsample{i + 6}')(x)
            x = jnp.concatenate([up, skips[3 - i]], axis=-1)
            x = Multiresblock(f * mult,
                              name=f'multiresblock{i + 6}')(x, train=train)
        out = Conv2dBN(self.nclasses, 1, activation='None',
                       name='conv_final')(x, train=train)
        return out if self.nclasses > 1 else nn.sigmoid(out)
