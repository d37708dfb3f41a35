"""EIU-Net head (≙ reference ``decode_heads/eiunet_head.py:656`` —
dead-on-disk in the reference: decorated but not imported by its
``__init__``; carried for full inventory parity).

Inverted-residual encoder with soft-pool downsampling, EPSA (pyramid
split attention) bottleneck, ASPP bridge, multi-scale attention skips,
deep-supervision reshape heads fused by a CBAM-style scale-attention
block. Faithful quirks kept: the PSA branch concat is REVERSED
([x4,x3,x2,x1]) by the reference's loop; its shared SE module scores all
four branches; ChannelAtt gates with |BN γ|/Σ|γ|; the deep-supervision
maps are upsampled to the input size (the reference hardcodes 224x320 —
generalized to the actual input size, its evident intent)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import (BatchNorm, Conv2d, ConvTranspose2d, Dropout, Linear,
                      avg_pool2d)
from ..builder import HEADS
from .decode_head import BaseDecodeHead


def _soft_pool2(x):
    """SoftPool (reference ``SoftPooling2D(2, 2)``): avg(e^x * x)/avg(e^x)
    over 2x2 windows — computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    e = jnp.exp(xf)
    out = avg_pool2d(e * xf, 2) / avg_pool2d(e, 2)
    return out.astype(x.dtype)


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    use_bias: bool = True
    relu6: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = Conv2d(self.features, self.kernel, stride=self.stride,
                   padding=pad, groups=self.groups, dilation=self.dilation,
                   use_bias=self.use_bias, name='conv')(x)
        x = BatchNorm(name='bn')(x, train=train)
        return jnp.minimum(nn.relu(x), 6) if self.relu6 else nn.relu(x)


class ResEncoderEIU(nn.Module):
    """conv-bn-relu x2 + 1x1 shortcut (reference ``ResEncoder``)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = Conv2d(self.features, 1, name='conv1x1')(x)
        h = _ConvBNRelu(self.features, name='c1')(x, train=train)
        h = _ConvBNRelu(self.features, name='c2')(h, train=train)
        return nn.relu(h + res)


class InvertedResidualEIU(nn.Module):
    """MobileNetV2-style block, always-projected shortcut at stride 1
    (reference ``InvertedResidual``)."""
    features: int
    expansion: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] * self.expansion
        h = _ConvBNRelu(mid, 1, name='pw')(x, train=train)
        h = _ConvBNRelu(mid, 3, groups=mid, name='dw')(h, train=train)
        h = Conv2d(self.features, 1, name='pw_linear_conv')(h)
        h = BatchNorm(name='pw_linear_bn')(h, train=train)
        s = Conv2d(self.features, 1, name='shortcut_conv')(x)
        s = BatchNorm(name='shortcut_bn')(s, train=train)
        return h + s


class SEWeight(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        s = nn.relu(Conv2d(max(c // self.reduction, 1), 1, name='fc1')(s))
        return nn.sigmoid(Conv2d(c, 1, name='fc2')(s))


class PSAModule(nn.Module):
    """Pyramid split attention (reference ``PSAModule``): 4 grouped convs
    (k=3/5/7/9), one SHARED SE scoring each branch, softmax over branches;
    the output concat order is reversed, as in the reference's loop."""
    planes: int
    conv_kernels: Sequence[int] = (3, 5, 7, 9)
    conv_groups: Sequence[int] = (1, 4, 8, 16)

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.planes // 4
        branches = [Conv2d(q, k, padding=k // 2, groups=g, use_bias=False,
                           name=f'conv_{i + 1}')(x)
                    for i, (k, g) in enumerate(zip(self.conv_kernels,
                                                   self.conv_groups))]
        se = SEWeight(name='se')
        weights = jnp.stack([se(b) for b in branches], axis=0)  # (4,B,1,1,q)
        weights = nn.softmax(weights, axis=0)
        weighted = [weights[i] * b for i, b in enumerate(branches)]
        return jnp.concatenate(weighted[::-1], axis=-1)  # reversed (quirk)


class EPSABlock(nn.Module):
    """Bottleneck with PSA core (reference ``EPSABlock``), expansion 4."""
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_c = self.planes * 4
        iden = Conv2d(out_c, 1, use_bias=False, name='shortcut_conv')(x)
        iden = BatchNorm(name='shortcut_bn')(iden, train=train)
        h = Conv2d(self.planes, 1, use_bias=False, name='conv1')(x)
        h = nn.relu(BatchNorm(name='bn1')(h, train=train))
        h = PSAModule(self.planes, name='conv2')(h, train=train)
        h = nn.relu(BatchNorm(name='bn2')(h, train=train))
        h = Conv2d(out_c, 1, use_bias=False, name='conv3')(h)
        h = BatchNorm(name='bn3')(h, train=train)
        return nn.relu(h + iden)


class ASPPEIU(nn.Module):
    """ASPP with ReLU6 + global branch (reference ``ASPP``), out 512."""
    rates: Sequence[int] = (6, 12, 18)
    out_channels: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        res = [_ConvBNRelu(oc, 1, use_bias=False, relu6=True,
                           name='b0')(x, train=train)]
        for i, r in enumerate(self.rates):
            res.append(_ConvBNRelu(oc, 3, dilation=r, use_bias=False,
                                   relu6=True, name=f'b{i + 1}')(x,
                                                                 train=train))
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        g = _ConvBNRelu(oc, 1, use_bias=False, relu6=True,
                        name='pool_branch')(g, train=train)
        g = resize(g, size=x.shape[1:3], mode='bilinear',
                   align_corners=False, warning=False)
        res.append(g)
        h = _ConvBNRelu(oc, 1, use_bias=False, relu6=True,
                        name='project')(jnp.concatenate(res, axis=-1),
                                        train=train)
        return Dropout(0.5, name='drop')(h, train=train)


class ChannelAttEIU(nn.Module):
    """BN-weight channel gate (reference ``ChannelAtt``): scale by
    |γ|/Σ|γ|, sigmoid, times residual."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        c = x.shape[-1]
        scale = self.param('bn_scale', nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param('bn_bias', nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - mean ** 2
            if not self.is_initializing():
                m = 0.9  # reference momentum=0.9
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        w = jnp.abs(scale) / jnp.sum(jnp.abs(scale))
        y = y * w
        return (nn.sigmoid(y) * res.astype(jnp.float32)).astype(x.dtype)


class MultiScaleAttention(nn.Module):
    """Cross-scale gate (reference ``MultiScaleAttention``)."""
    y_ch: int

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        x = _ConvBNRelu(self.y_ch, 3, use_bias=False,
                        name='conv_x')(x, train=train)
        y = resize(y, size=x.shape[1:3], mode='bilinear',
                   align_corners=True, warning=False)
        pools = []
        for t in (x, y):
            pools.append(jnp.mean(t.astype(jnp.float32), axis=(1, 2),
                                  keepdims=True).astype(t.dtype))
        for t in (x, y):
            pools.append(jnp.max(t, axis=(1, 2), keepdims=True))
        att = jnp.concatenate(pools, axis=-1)       # (B, 1, 1, 4*y_ch)
        att = _ConvBNRelu(self.y_ch // 2, 1, use_bias=False,
                          name='conv_xy_0')(att, train=train)
        att = Conv2d(self.y_ch, 1, use_bias=False, name='conv_xy_1')(att)
        att = BatchNorm(name='conv_xy_bn')(att, train=train)
        att = ChannelAttEIU(name='channel_att')(att, train=train)
        return x * att + y * (1 - att)


class _ScaleChannelGate(nn.Module):
    """lp + softpool channel gate over the 16 dsv channels
    (reference ``ChannelGate`` with pool_types ['lp', 'sp'])."""
    gate_channels: int = 16
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        xf = x.astype(jnp.float32)
        # lp pool (p=2): (sum x^2)^(1/2) over the full map
        lp = jnp.sqrt(jnp.sum(jnp.square(xf), axis=(1, 2)))
        # softpool over the full map
        e = jnp.exp(xf)
        sp = jnp.sum(e * xf, axis=(1, 2)) / jnp.sum(e, axis=(1, 2))
        mlp_fc1 = Linear(self.gate_channels // self.reduction, name='fc1')
        mlp_fc2 = Linear(self.gate_channels, name='fc2')
        att = sum(mlp_fc2(nn.relu(mlp_fc1(p.astype(x.dtype))))
                  for p in (lp, sp))
        # group-average: reshape (B, 4, 4), mean over the inner axis
        att = att.reshape(b, 4, 4)
        att = jnp.mean(att, axis=2, keepdims=True)
        att = jnp.broadcast_to(att, (b, 4, 4)).reshape(b, 16)
        scale = nn.sigmoid(att)[:, None, None, :]
        return x * scale


class _ScaleSpatialAtten(nn.Module):
    """Group-shared spatial gate (reference ``SpatialAtten``)."""
    out_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = _ConvBNRelu(self.out_size, 3, use_bias=False,
                        name='conv1')(x, train=train)
        h = nn.relu(Conv2d(self.out_size, 1, use_bias=False,
                           name='conv2')(h))
        att = nn.sigmoid(h)                       # (B, H, W, 4)
        att = jnp.repeat(att, 4, axis=-1)         # group g -> channels g*4+j
        return res * att + res


class ScaleAttenBlock(nn.Module):
    """dsv fusion (reference ``scale_atten_convblock_softpool``):
    channel gate + spatial gate + residual, then 3x3 to out_size."""
    out_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        h = _ScaleChannelGate(name='cbam_channel')(x)
        h = _ScaleSpatialAtten(name='cbam_spatial')(h, train=train)
        h = nn.relu(h + res)
        h = Conv2d(self.out_size, 3, padding=1, use_bias=False,
                   name='conv3')(h)
        return nn.relu(BatchNorm(name='bn3')(h, train=train))


class _EIUDoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBNRelu(self.features, name='c1')(x, train=train)
        return _ConvBNRelu(self.features, name='c2')(x, train=train)


@HEADS.register_module()
class EIU_Net(BaseDecodeHead):
    """EIU-Net (reference ``eiunet_head.py:656``)."""
    n_channels: int = 3
    n_classes: int = 2
    filters: Sequence[int] = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = list(self.filters)
        full_hw = x.shape[1:3]
        enc_in = ResEncoderEIU(f[0], name='enc_input')(x, train=train)
        enc_1 = InvertedResidualEIU(f[1], name='encoder_1')(
            _soft_pool2(enc_in), train=train)
        mid_1 = _soft_pool2(MultiScaleAttention(f[1], name='msa_1')(
            enc_in, enc_1, train=train))
        enc_2 = InvertedResidualEIU(f[2], name='encoder_2')(
            _soft_pool2(enc_1), train=train)
        mid_2 = _soft_pool2(MultiScaleAttention(f[2], name='msa_2')(
            enc_1, enc_2, train=train))
        enc_3 = InvertedResidualEIU(f[3], name='encoder_3')(
            _soft_pool2(enc_2), train=train)
        mid_3 = _soft_pool2(MultiScaleAttention(f[3], name='msa_3')(
            enc_2, enc_3, train=train))
        enc_4 = EPSABlock(128, name='encoder_4')(_soft_pool2(enc_3),
                                                 train=train)
        enc_4 = ASPPEIU(name='aspp')(enc_4, train=train)

        up4 = ConvTranspose2d(f[3], 2, 2, name='decoder_4')(enc_4)
        up4 = _EIUDoubleConv(f[3], name='double_conv_4')(
            jnp.concatenate([mid_3, up4], axis=-1), train=train)
        up3 = ConvTranspose2d(f[2], 2, 2, name='decoder_3')(up4)
        up3 = _EIUDoubleConv(f[2], name='double_conv_3')(
            jnp.concatenate([mid_2, up3], axis=-1), train=train)
        up2 = ConvTranspose2d(f[1], 2, 2, name='decoder_2')(up3)
        up2 = _EIUDoubleConv(f[1], name='double_conv_2')(
            jnp.concatenate([mid_1, up2], axis=-1), train=train)
        up1 = ConvTranspose2d(f[0], 2, 2, name='decoder_1')(up2)
        up1 = _EIUDoubleConv(f[0], name='double_conv_1')(
            jnp.concatenate([enc_in, up1], axis=-1), train=train)

        def dsv(t, name):
            t = Conv2d(4, 1, name=name)(t)
            return resize(t, size=full_hw, mode='bilinear',
                          align_corners=False, warning=False)

        cat = jnp.concatenate([dsv(up1, 'reshape_1'), dsv(up2, 'reshape_2'),
                               dsv(up3, 'reshape_3'), dsv(up4, 'reshape_4')],
                              axis=-1)
        out = ScaleAttenBlock(name='scale_att')(cat, train=train)
        return Conv2d(self.n_classes, 1, name='final')(out)
