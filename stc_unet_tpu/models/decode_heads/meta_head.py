"""META-Unet head (≙ reference ``decode_heads/meta_head.py`` — dead-on-disk
in the reference: decorated but not imported by its ``__init__``; carried
for full inventory parity).

Multiscale Efficient Transformer Attention over an embedded resnet34
encoder: 1/4..1/32 features projected to a common width, fused coarse→fine
through META gates (local patch attention + ratio-reduced global
attention, summed and sigmoid-gated), then a 4x-upsampling seg head.
Faithful quirk kept: the local branch's ``(attn @ v).transpose(-1, -2)``
reshape interleaves head/channel axes (the reference transposes N with
head_dim before flattening) — replicated bit-for-bit. The reference pulls
ImageNet resnet34 weights at build time; weights initialize randomly here
(load via the torch converter instead).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, Dropout, Linear, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead
from .extra_unet_heads import _BasicBlock


class CBR(nn.Module):
    """conv + BN + PReLU (reference ``meta_head.py:216``)."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = Conv2d(self.features, self.kernel, stride=self.stride,
                   padding=pad, groups=self.groups, dilation=self.dilation,
                   use_bias=False, name='conv2d')(x)
        x = BatchNorm(name='bn')(x, train=train)
        alpha = self.param('prelu', nn.initializers.constant(0.25),
                           (self.features,), jnp.float32)
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class _Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.gelu(Linear(self.hidden, name='fc1')(x))
        x = Dropout(self.drop, name='drop1')(x, train=train)
        x = Linear(self.out, name='fc2')(x)
        return Dropout(self.drop, name='drop2')(x, train=train)


class _GlobalAttention(nn.Module):
    """Efficient attention: K/V spatially reduced by strided convs, LN on
    per-head K/V (reference ``Self_Attention``)."""
    dim: int
    ratio_h: int = 2
    ratio_w: int = 2
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        h = w = int(math.isqrt(n))
        nh, hd = self.num_heads, c // self.num_heads
        qkv = Linear(c * 3, use_bias=self.qkv_bias, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        k = Conv2d(c, (self.ratio_h, self.ratio_w),
                   stride=(self.ratio_h, self.ratio_w),
                   use_bias=self.qkv_bias,
                   name='ke')(k.reshape(b, h, w, c))
        v = Conv2d(c, (self.ratio_h, self.ratio_w),
                   stride=(self.ratio_h, self.ratio_w),
                   use_bias=self.qkv_bias,
                   name='ve')(v.reshape(b, h, w, c))
        m = k.shape[1] * k.shape[2]
        k = k.reshape(b, m, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, nh, hd).transpose(0, 2, 1, 3)
        k = nn.LayerNorm(name='norm_k', dtype=k.dtype)(k)
        v = nn.LayerNorm(name='norm_v', dtype=v.dtype)(v)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) * hd ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return Linear(c, name='proj')(out)


class _LocalAttention(nn.Module):
    """Patch-local attention (reference ``Self_Attention_local``), with the
    reference's transpose(-1, -2)-before-reshape quirk."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, r, n, c = x.shape
        nh, hd = self.num_heads, c // self.num_heads
        qkv = Linear(c * 3, use_bias=self.qkv_bias, name='qkv')(x)
        qkv = qkv.reshape(b, r, n, 3, nh, hd).transpose(3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (B, R, nh, N, hd)
        attn = jnp.einsum('brhqd,brhkd->brhqk', q, k) * hd ** -0.5
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('brhqk,brhkd->brhqd', attn, v)  # (B, R, nh, N, hd)
        # reference quirk: transpose N <-> head_dim before flattening
        out = out.transpose(0, 1, 2, 4, 3).reshape(b, r, n, c)
        return Linear(c, name='proj')(out)


class _ETBlock(nn.Module):
    """Pre-LN transformer block shared by both branches."""
    dim: int
    local: bool = False
    ratio_h: int = 2
    ratio_w: int = 2
    num_heads: int = 8
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.local:
            attn = _LocalAttention(self.dim, self.num_heads, name='attn')
        else:
            attn = _GlobalAttention(self.dim, self.ratio_h, self.ratio_w,
                                    self.num_heads, name='attn')
        x = x + attn(nn.LayerNorm(name='norm1', dtype=x.dtype)(x),
                     train=train)
        y = nn.LayerNorm(name='norm2', dtype=x.dtype)(x)
        return x + _Mlp(int(self.dim * self.mlp_ratio), self.dim,
                        name='mlp')(y, train=train)


class META(nn.Module):
    """Multiscale efficient transformer attention gate
    (reference ``meta_head.py:433``)."""
    dim: int
    ph: int = 4
    pw: int = 4
    ratio_h: int = 2
    ratio_w: int = 2
    num_heads: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh_p, nw_p = h // self.ph, w // self.pw
        loc = x.reshape(b, nh_p, self.ph, nw_p, self.pw, c)
        loc = loc.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, nh_p * nw_p, self.ph * self.pw, c)
        loc = _ETBlock(self.dim, local=True, num_heads=self.num_heads,
                       name='loc_attn')(loc, train=train)
        loc = loc.reshape(b, nh_p, nw_p, self.ph, self.pw, c)
        loc = loc.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        glo = _ETBlock(self.dim, local=False, ratio_h=self.ratio_h,
                       ratio_w=self.ratio_w, num_heads=self.num_heads,
                       name='glo_attn')(x.reshape(b, h * w, c), train=train)
        glo = glo.reshape(b, h, w, c)
        return x * nn.sigmoid(loc + glo)


class _ResNet34Encoder(nn.Module):
    """Embedded resnet34 (reference ``meta_head.py:100,172``):
    feat2..feat32 pyramid."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat2 = Conv2d(64, 7, stride=2, padding=3, use_bias=False,
                       name='conv1')(x)
        h = nn.relu(BatchNorm(name='bn1')(feat2, train=train))
        h = max_pool2d(h, 3, stride=2, padding=1)
        feats = [feat2]
        for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for bi in range(blocks):
                h = _BasicBlock(planes, stride=stride if bi == 0 else 1,
                                name=f'layer{li + 1}_{bi}')(h, train=train)
            feats.append(h)
        return feats


@HEADS.register_module()
class META_Unet(BaseDecodeHead):
    """META-Unet (reference ``meta_head.py:493``)."""
    nIn: int = 3
    classes: int = 2
    p1: int = 4
    p2: int = 4
    p3: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, f4, f8, f16, f32 = _ResNet34Encoder(name='backbone')(
            x, train=train)
        c0 = 32
        f4 = CBR(c0, 1, name='proj4')(f4, train=train)
        f8 = CBR(c0, 1, name='proj8')(f8, train=train)
        f16 = CBR(c0, 1, name='proj16')(f16, train=train)
        f32 = CBR(c0, 1, name='proj32')(f32, train=train)

        def up2(t):
            return resize(t, scale_factor=2, mode='bilinear',
                          align_corners=True, warning=False)

        f16 = META(c0, ph=self.p1, pw=self.p1, ratio_h=4, ratio_w=4,
                   num_heads=4, name='mstf32_16')(f16 + up2(f32),
                                                  train=train)
        f8 = META(c0, ph=self.p2, pw=self.p2, ratio_h=8, ratio_w=8,
                  num_heads=4, name='mstf16_8')(f8 + up2(f16), train=train)
        f4 = META(c0, ph=self.p3, pw=self.p3, ratio_h=8, ratio_w=8,
                  num_heads=4, name='mstf8_4')(f4 + up2(f8), train=train)

        # seg head: x2 + residual CBR, x2, 3x3 classifier
        y = up2(f4)
        y = y + CBR(c0, 3, name='seg_conv1')(y, train=train)
        y = up2(y)
        return Conv2d(self.classes, 3, padding=1, name='seg_conv2')(y)
