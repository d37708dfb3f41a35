"""ACC-UNet head (≙ reference ``decode_heads/acc_head.py`` — dead-on-disk
in the reference: decorated but not imported by its ``__init__``; carried
for full inventory parity).

HANC (hierarchical aggregation of neighborhood context) blocks with
channel-SE everywhere, ResPath skips and the MLFC stage. Faithful quirks:
the reference's MLFC ``forward`` only applies its four SE layers (all its
conv blocks are dead parameters — not instantiated here, zero compute
delta); ``ResPath.sqe`` is actually a second BatchNorm (naming trap kept
as BN); multi-class output has ``n_classes + 1`` channels; ``cnv72`` uses
``inv_fctr=34`` (a literal in the reference). The HANC concat trick
(cat over H then view) interleaves per-channel scale blocks — replicated
with an exact-order stack+reshape.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import (BatchNorm, Conv2d, Linear, avg_pool2d, max_pool2d)
from ..builder import HEADS
from .decode_head import BaseDecodeHead


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def _up_nearest(x, factor):
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class ChannelSELayer(nn.Module):
    """SE + BN + LeakyReLU (reference ``acc_head.py:139``)."""
    reduction_ratio: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        s = _lrelu(Linear(c // self.reduction_ratio, name='fc1')(s))
        s = nn.sigmoid(Linear(c, name='fc2')(s))
        out = x * s[:, None, None, :]
        out = BatchNorm(name='bn')(out, train=train)
        return _lrelu(out)


class HANCLayer(nn.Module):
    """Hierarchical neighborhood-context aggregation
    (reference ``acc_head.py:180``). Scale blocks per channel are
    interleaved exactly like the reference's cat-over-H + view trick."""
    out_chnl: int
    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = [x]
        for p in [2 ** i for i in range(1, self.k)]:
            blocks.append(_up_nearest(avg_pool2d(x, p), p))
        for p in [2 ** i for i in range(1, self.k)]:
            blocks.append(_up_nearest(max_pool2d(x, p), p))
        if len(blocks) > 1:
            b, h, w, c = x.shape
            # channel order: new_ch[c*(2k-1)+j] = block j of channel c
            y = jnp.stack(blocks, axis=-1).reshape(b, h, w,
                                                   c * (2 * self.k - 1))
        else:
            y = x
        y = Conv2d(self.out_chnl, 1, name='cnv')(y)
        return _lrelu(BatchNorm(name='bn')(y, train=train))


class HANCBlock(nn.Module):
    """Inverted-bottleneck + HANC + SE (reference ``acc_head.py:346``)."""
    out_channels: int
    k: int = 3
    inv_fctr: int = 3

    @nn.compact
    def __call__(self, inp, train: bool = False):
        c_in = inp.shape[-1]
        x = Conv2d(c_in * self.inv_fctr, 1, name='conv1')(inp)
        x = _lrelu(BatchNorm(name='norm1')(x, train=train))
        x = Conv2d(c_in * self.inv_fctr, 3, padding=1,
                   groups=c_in * self.inv_fctr, name='conv2')(x)
        x = _lrelu(BatchNorm(name='norm2')(x, train=train))
        x = HANCLayer(c_in, self.k, name='hnc')(x, train=train)
        x = BatchNorm(name='norm')(x + inp, train=train)
        x = Conv2d(self.out_channels, 1, name='conv3')(x)
        x = _lrelu(BatchNorm(name='norm3')(x, train=train))
        return ChannelSELayer(name='sqe')(x, train=train)


class ResPathACC(nn.Module):
    """SE-gated residual skip chain (reference ``acc_head.py:409``).
    The trailing ``sqe`` attribute is a BatchNorm in the reference."""
    n_lvl: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        for i in range(self.n_lvl):
            y = Conv2d(c, 3, padding=1, name=f'convs_{i}')(x)
            y = _lrelu(BatchNorm(name=f'bns_{i}')(y, train=train))
            x = x + ChannelSELayer(name=f'sqes_{i}')(y, train=train)
        x = _lrelu(BatchNorm(name='bn')(x, train=train))
        return BatchNorm(name='sqe')(x, train=train)


class MLFC(nn.Module):
    """Multi-level feature compilation (reference ``acc_head.py:449``):
    the forward only applies the four SE layers; the conv banks are dead
    parameters in the reference and are omitted here."""

    @nn.compact
    def __call__(self, x1, x2, x3, x4, train: bool = False):
        return (ChannelSELayer(name='sqe1')(x1, train=train),
                ChannelSELayer(name='sqe2')(x2, train=train),
                ChannelSELayer(name='sqe3')(x3, train=train),
                ChannelSELayer(name='sqe4')(x4, train=train))


@HEADS.register_module()
class ACCUNet(BaseDecodeHead):
    """ACC-UNet (reference ``acc_head.py:7``)."""
    n_channels: int = 3
    n_classes: int = 1
    n_filts: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.n_filts

        def twin(x, c, k, name, inv2=3):
            x = HANCBlock(c, k=k, name=f'cnv{name}1')(x, train=train)
            return HANCBlock(c, k=k, inv_fctr=inv2,
                             name=f'cnv{name}2')(x, train=train)

        x2 = twin(x, f, 3, '1')
        x3 = twin(max_pool2d(x2, 2), f * 2, 3, '2')
        x4 = twin(max_pool2d(x3, 2), f * 4, 3, '3')
        x5 = twin(max_pool2d(x4, 2), f * 8, 2, '4')
        x6 = twin(max_pool2d(x5, 2), f * 16, 1, '5')

        x2 = ResPathACC(4, name='rspth1')(x2, train=train)
        x3 = ResPathACC(3, name='rspth2')(x3, train=train)
        x4 = ResPathACC(2, name='rspth3')(x4, train=train)
        x5 = ResPathACC(1, name='rspth4')(x5, train=train)

        for i in (1, 2, 3):
            x2, x3, x4, x5 = MLFC(name=f'mlfc{i}')(x2, x3, x4, x5,
                                                   train=train)

        from ..bricks import ConvTranspose2d
        up = ConvTranspose2d(f * 8, 2, 2, name='up6')(x6)
        x7 = twin(jnp.concatenate([up, x5], axis=-1), f * 8, 2, '6')
        up = ConvTranspose2d(f * 4, 2, 2, name='up7')(x7)
        # cnv72 carries the reference's inv_fctr=34 literal
        x8 = twin(jnp.concatenate([up, x4], axis=-1), f * 4, 3, '7',
                  inv2=34)
        up = ConvTranspose2d(f * 2, 2, 2, name='up8')(x8)
        x9 = twin(jnp.concatenate([up, x3], axis=-1), f * 2, 3, '8')
        up = ConvTranspose2d(f, 2, 2, name='up9')(x9)
        x10 = twin(jnp.concatenate([up, x2], axis=-1), f, 3, '9')

        if self.n_classes == 1:
            return nn.sigmoid(Conv2d(1, 1, name='out')(x10))
        return Conv2d(self.n_classes + 1, 1, name='out')(x10)
