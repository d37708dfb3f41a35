"""CARUnet head (≙ reference ``decode_heads/carunet_head.py:12``).

Coordinate-attention residual U-Net: CADRB / DenseCADRB encoder-decoder
blocks gated by MecaBlock (channel) or CoordAtt (coordinate) attention,
optional DenseASPP bridge. Takes the image directly (identity backbone),
like the other fork heads.

Faithful notes: the reference constructs ``attention_blcok*`` (SKAttention /
MecaBlock) modules in ``__init__`` that its ``forward`` never calls — dead
parameters; not instantiated here (compute graph is identical).
:class:`SKAttention` is still provided (and tested) for inventory parity.
The pre-activation ConvolutionBlockDropblock (BN on the *input* channels,
then relu, then conv) and the hardwired ``+5*64`` DenseASPP projection width
are replicated as-is.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, Dropout, Linear, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead
from .unet_head import CoordAtt


class ConvBlockDrop(nn.Module):
    """BN(input) → [relu] → conv3x3 (reference ``carunet_head.py:176``)."""
    features: int
    activate: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = BatchNorm(name='bn')(x, train=train)
        if self.activate:
            h = nn.relu(h)
        return Conv2d(self.features, 3, padding=1, name='conv1')(h)


class MecaBlock(nn.Module):
    """Shared-MLP channel attention over avg+max pooled stats
    (reference ``carunet_head.py:192``); returns the (N,1,1,C) score."""
    ratio: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y_avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        y_max = jnp.max(x, axis=(1, 2))
        shared = Linear(c, use_bias=False, name='shared_conv')
        out = shared(y_avg) + shared(y_max)
        out = Linear(c // self.ratio, use_bias=False, name='fc1')(out)
        out = nn.relu(out)
        out = Linear(c, use_bias=False, name='fc2')(out)
        return nn.sigmoid(out)[:, None, None, :]


class CADRB(nn.Module):
    """Channel-attention dense residual block (reference ``:91``)."""
    features: int
    activate: bool = True
    ca: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBlockDrop(self.features, name='conv1_1')(x, train=train)
        out = ConvBlockDrop(self.features, name='conv1_2')(out, train=train)
        if self.ca:
            score = CoordAtt(self.features, name='meca')(out, train=train)
        else:
            score = MecaBlock(name='meca')(out)
        out = score * out
        block = Conv2d(self.features, 1, name='block_conv')(x)
        out = jnp.concatenate([out, block], axis=-1)
        out = Conv2d(self.features, 1, name='conv_final')(out)
        if self.activate:
            out = BatchNorm(name='bn')(out, train=train)
            out = nn.relu(out)
        return out


class DenseCADRB(nn.Module):
    """Densely-gated CADRB variant (reference ``:120``)."""
    features: int
    activate: bool = True
    ca: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out1 = ConvBlockDrop(self.features, name='conv1_1')(x, train=train)
        if self.ca:
            out1 = CoordAtt(self.features, name='meca1')(
                out1, train=train) * out1
        else:
            out1 = MecaBlock(name='meca1')(out1) * out1
        out2 = ConvBlockDrop(self.features, name='conv1_2')(out1, train=train)
        if self.ca:
            out2 = CoordAtt(self.features, name='meca2')(
                out2, train=train) * out2
        else:
            out2 = MecaBlock(name='meca2')(out2) * out2
        block = Conv2d(self.features, 1, name='block_conv')(x)
        out = jnp.concatenate([out1, out2, block], axis=-1)
        out = Conv2d(self.features, 1, name='conv_final')(out)
        if self.activate:
            out = BatchNorm(name='bn')(out, train=train)
            out = nn.relu(out)
        return out


class _DenseASPPConv(nn.Module):
    """1x1 reduce → 3x3 dilated, both BN+relu, +dropout (reference ``:274``)."""
    inter: int
    out: int
    rate: int
    drop_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.inter, 1, name='conv1')(x)
        x = nn.relu(BatchNorm(name='bn1')(x, train=train))
        x = Conv2d(self.out, 3, padding=self.rate, dilation=self.rate,
                   name='conv2')(x)
        x = nn.relu(BatchNorm(name='bn2')(x, train=train))
        if self.drop_rate > 0:
            x = Dropout(self.drop_rate, name='drop')(x, train=train)
        return x


class DenseASPPBlock(nn.Module):
    """Densely-connected ASPP bridge (reference ``:293``). The final 1x1
    projects from ``in + 5*64`` channels — the reference hardwires 64."""
    inter1: int = 256
    inter2: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        for rate in (3, 6, 12, 18, 24):
            a = _DenseASPPConv(self.inter1, self.inter2, rate,
                               name=f'aspp_{rate}')(x, train=train)
            x = jnp.concatenate([a, x], axis=-1)
        x = Dropout(0.1, name='drop')(x, train=train)
        return Conv2d(self.inter2, 1, name='proj')(x)


class SKAttention(nn.Module):
    """Selective-kernel attention (reference ``:336``): multi-kernel conv
    branches, softmax-fused over the branch axis. Provided for inventory
    parity — the reference creates but never calls it inside CARUnet."""
    kernels: Sequence[int] = (1, 3, 5, 7)
    reduction: int = 4
    L: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        d = max(self.L, c // self.reduction)
        feats = []
        for k in self.kernels:
            h = Conv2d(c, k, padding=k // 2, name=f'conv{k}')(x)
            h = nn.relu(BatchNorm(name=f'bn{k}')(h, train=train))
            feats.append(h)
        u = sum(feats)
        s = jnp.mean(u, axis=(1, 2))
        z = Linear(d, name='fc')(s)
        weights = jnp.stack(
            [Linear(c, name=f'fcs{i}')(z)[:, None, None, :]
             for i in range(len(self.kernels))])
        weights = nn.softmax(weights, axis=0)
        return jnp.sum(weights * jnp.stack(feats), axis=0)


class _CarUp(nn.Module):
    """Bilinear 2x (align_corners=True) + concat skip + (Dense)CADRB
    (reference ``:72``)."""
    features: int
    ca: bool = False
    dense: bool = False

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = resize(x1, scale_factor=2, mode='bilinear', align_corners=True,
                    warning=False)
        x = jnp.concatenate([x2, x1], axis=-1)
        block = DenseCADRB if self.dense else CADRB
        return block(self.features, ca=self.ca, name='conv')(x, train=train)


@HEADS.register_module()
class CARUnet(BaseDecodeHead):
    """CARUnet (reference ``carunet_head.py:12``)."""
    ca: bool = False
    denseaspp: bool = False
    densecadrb: bool = False
    in_channel: int = 3  # reference ctor arg (shape-inferred here)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = DenseCADRB if self.densecadrb else CADRB
        e1 = block(16, ca=self.ca, name='cadrb_encoder1')(x, train=train)
        e2 = block(32, ca=self.ca, name='cadrb_encoder2')(
            max_pool2d(e1, 2), train=train)
        e3 = block(64, ca=self.ca, name='cadrb_encoder3')(
            max_pool2d(e2, 2), train=train)
        e4 = block(64, ca=self.ca, name='cadrb_encoder4')(
            max_pool2d(e3, 2), train=train)
        if self.denseaspp:
            e4 = DenseASPPBlock(name='denseaspp_block')(e4, train=train)
        d3 = _CarUp(32, ca=self.ca, dense=self.densecadrb,
                    name='cadrb_decoder3')(e4, e3, train=train)
        d2 = _CarUp(16, ca=self.ca, dense=self.densecadrb,
                    name='cadrb_decoder2')(d3, e2, train=train)
        d1 = _CarUp(16, ca=self.ca, dense=self.densecadrb,
                    name='cadrb_decoder1')(d2, e1, train=train)
        return Conv2d(self.final_out_channels, 1, name='conv_seg')(d1)
