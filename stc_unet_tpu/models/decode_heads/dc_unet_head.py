"""DC-UNet head (≙ reference ``decode_heads/dc_unet_head.py:30,76,106``).

Dual-channel multires U-Net: each ``DCBlock`` runs two cascaded 3x3 chains
(receptive fields 3/5/7) plus a 1x1 shortcut, summed then re-normalized;
skips pass through ``ResPath`` chains. Faithful quirks kept: reflect 'same'
padding, BN ``affine=False`` after relu/sigmoid convs, and the tanh output
conv (reference ``conv2d_bn``/``conv10``).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import BatchNorm, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class Conv2dSame(nn.Module):
    """Reflection-padded 'same' conv (reference ``Conv2dSame``)."""
    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ka = k // 2
        kb = ka - 1 if k % 2 == 0 else ka
        if ka or kb:
            x = jnp.pad(x, ((0, 0), (ka, kb), (ka, kb), (0, 0)),
                        mode='reflect')
        return nn.Conv(self.features, (k, k), padding='VALID',
                       use_bias=self.use_bias, dtype=x.dtype,
                       name='conv')(x)


class ConvBn(nn.Module):
    """conv2d_bn (reference): conv → BN(affine iff no relu/sigmoid) → act."""
    features: int
    kernel_size: int
    activation: Optional[str] = 'relu'

    @nn.compact
    def __call__(self, x, train: bool = False):
        affine = self.activation not in ('relu', 'sigmoid')
        x = Conv2dSame(self.features, self.kernel_size, use_bias=False,
                       name='0')(x)
        x = BatchNorm(affine=affine, name='1')(x, train=train)
        if self.activation == 'relu':
            x = nn.relu(x)
        elif self.activation == 'sigmoid':
            x = nn.sigmoid(x)
        elif self.activation == 'tanh':
            x = jnp.tanh(x)
        return x


def dc_out_channel(u: float, alpha: float = 1.67) -> int:
    w = alpha * u
    return int(w * 0.167) + int(w * 0.333) + int(w * 0.5)


class DCBlock(nn.Module):
    """Dual-channel multires block (reference ``dc_unet_head.py:30``)."""
    u: float
    alpha: float = 1.67
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.alpha * self.u
        c3, c5, c7 = int(w * 0.167), int(w * 0.333), int(w * 0.5)
        out_channel = c3 + c5 + c7
        if self.use_dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        shortcut = ConvBn(out_channel, 1, activation=None,
                          name='conv2d_bn')(x, train=train)
        a3 = ConvBn(c3, 3, name='conv3x3')(x, train=train)
        a5 = ConvBn(c5, 3, name='conv5x5')(a3, train=train)
        a7 = ConvBn(c7, 3, name='conv7x7')(a5, train=train)
        out = jnp.concatenate([a3, a5, a7], axis=-1)
        out = BatchNorm(name='bn_1')(out, train=train)
        b3 = ConvBn(c3, 3, name='conv3x3_2')(x, train=train)
        b5 = ConvBn(c5, 3, name='conv5x5_2')(b3, train=train)
        b7 = ConvBn(c7, 3, name='conv7x7_2')(b5, train=train)
        out2 = jnp.concatenate([b3, b5, b7], axis=-1)
        out2 = BatchNorm(name='bn_1_2')(out2, train=train)
        out_f = nn.relu(shortcut + out + out2)
        return BatchNorm(name='bn_2')(out_f, train=train)


class ResPathBlock(nn.Module):
    """1x1 shortcut + 3x3 conv, summed (reference ``dc_unet_head.py:76``)."""
    filters: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = ConvBn(self.filters, 1, activation=None,
                          name='conv2d_bn1')(x, train=train)
        out = ConvBn(self.filters, 3, name='conv2d_bn2')(x, train=train)
        out = nn.relu(shortcut + out)
        return BatchNorm(name='bn')(out, train=train)


class ResPath(nn.Module):
    """Chain of ResPathBlocks (reference ``dc_unet_head.py:94``)."""
    filters: int
    length: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ResPathBlock(self.filters, name='first_block')(x, train=train)
        for i in range(self.length - 1):
            x = ResPathBlock(self.filters, name=f'blocks_{i}')(x,
                                                               train=train)
        return x


class Deconv2x(nn.Module):
    """ConvTranspose2d(k=2, s=2) — exact torch output size (2H, 2W)."""
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                padding='VALID', dtype=x.dtype,
                                name='deconv')(x)


@HEADS.register_module()
class DC_Unet(BaseDecodeHead):
    """Monolithic DC-UNet (reference ``dc_unet_head.py:106``).

    ``with_cp`` rematerialises DCBlock/ResPath interiors in the backward
    pass (≙ torch ``checkpoint`` granularity): at 512^2/B=8 the plain train
    program's tens of full-resolution 51-channel activations exceed HBM,
    and saving only the block boundaries is far cheaper to recompute than
    the whole-loss ``jax.checkpoint`` fallback. Modes:

    - ``True``: remat every block (max memory savings, +1 full forward of
      recompute — measured 11.98 img/s at 512^2/B=8);
    - ``'hires'``: remat only blocks whose input is at or above quarter
      resolution (the top two encoder scales + the matching decoder tail),
      where ~90% of the activation memory lives — cheaper recompute at a
      slightly higher peak.

    Parameters/RNG are mode-independent — checkpoints trained either way
    are interchangeable."""
    nf: int = 32
    use_dropout: bool = False
    with_cp: object = False

    def _blk(self, mod, x, train: bool, hi: bool = False):
        remat = self.with_cp is True or (self.with_cp == 'hires' and hi)
        if remat and train and not self.is_initializing():
            return nn.remat(lambda m, y: m(y, train=True))(mod, x)
        return mod(x, train=train)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        blk = self._blk
        m1 = blk(DCBlock(u=nf, name='mres_block1'), x, train, hi=True)
        pool = max_pool2d(m1, 2)
        m1 = blk(ResPath(nf, 4, name='res_path1'), m1, train, hi=True)

        m2 = blk(DCBlock(u=nf * 2, name='mres_block2'), pool, train, hi=True)
        pool = max_pool2d(m2, 2)
        m2 = blk(ResPath(nf * 2, 3, name='res_path2'), m2, train, hi=True)

        m3 = blk(DCBlock(u=nf * 4, name='mres_block3'), pool, train)
        pool = max_pool2d(m3, 2)
        m3 = blk(ResPath(nf * 4, 2, name='res_path3'), m3, train)

        m4 = blk(DCBlock(u=nf * 8, name='mres_block4'), pool, train)
        pool = max_pool2d(m4, 2)
        m4 = blk(ResPath(nf * 8, 1, name='res_path4'), m4, train)

        m = blk(DCBlock(u=nf * 16, name='mres_block5'), pool, train)

        up = jnp.concatenate([Deconv2x(nf * 8, name='deconv1')(m), m4],
                             axis=-1)
        m = blk(DCBlock(u=nf * 8, use_dropout=self.use_dropout,
                        name='mres_block6'), up, train)
        up = jnp.concatenate([Deconv2x(nf * 4, name='deconv2')(m), m3],
                             axis=-1)
        m = blk(DCBlock(u=nf * 4, use_dropout=self.use_dropout,
                        name='mres_block7'), up, train)
        up = jnp.concatenate([Deconv2x(nf * 2, name='deconv3')(m), m2],
                             axis=-1)
        m = blk(DCBlock(u=nf * 2, use_dropout=self.use_dropout,
                        name='mres_block8'), up, train, hi=True)
        up = jnp.concatenate([Deconv2x(nf, name='deconv4')(m), m1], axis=-1)
        m = blk(DCBlock(u=nf, name='mres_block9'), up, train, hi=True)
        return ConvBn(self.final_out_channels, 1, activation='tanh',
                      name='conv10')(m, train=train)
