"""PYAttUNet head (≙ reference ``decode_heads/pdatt_head.py:438`` —
dead-on-disk in the reference: decorated but not imported by its
``__init__``; carried for full inventory parity. The file's other classes
— UNet, UNetplus, AttUNet, PAttUNet, DAttUNet — are unregistered plain
modules there and are not part of the public surface).

Pyramid-input dual-decoder attention U-Net: the input image is resized to
a /2../16 pyramid, each scale gets its own conv tower whose output gates
the pooled main-path feature (additive attention blocks), and TWO
attention decoders run — the second decoder's output is computed and
discarded by the reference's forward (``return output``); replicated
faithfully (its parameters still exist and train through... nothing).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, max_pool2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class _DoubleConv(nn.Module):
    """conv-BN-relu x2, bias-free convs (reference ``pdatt_head.py:17``)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = Conv2d(self.features, 3, padding=1, use_bias=False,
                       name=f'conv{i}')(x)
            x = nn.relu(BatchNorm(name=f'bn{i}')(x, train=train))
        return x


class AttentionBlock(nn.Module):
    """Additive attention gate (reference ``pdatt_head.py:35``)."""
    f_int: int

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = Conv2d(self.f_int, 1, name='W_g_conv')(g)
        g1 = BatchNorm(name='W_g_bn')(g1, train=train)
        x1 = Conv2d(self.f_int, 1, name='W_x_conv')(x)
        x1 = BatchNorm(name='W_x_bn')(x1, train=train)
        psi = nn.relu(g1 + x1)
        psi = Conv2d(1, 1, name='psi_conv')(psi)
        psi = nn.sigmoid(BatchNorm(name='psi_bn')(psi, train=train))
        return x * psi


@HEADS.register_module()
class PYAttUNet(BaseDecodeHead):
    """Pyramid dual-decoder attention U-Net (reference ``pdatt_head.py:438``)."""
    input_channels: int = 3
    deep_supervision: bool = False
    nb_filter: tuple = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = list(self.nb_filter)
        h, w = x.shape[1:3]
        images = [resize(x, size=(h // d, w // d), mode='bilinear',
                         align_corners=False, warning=False)
                  for d in (2, 4, 8, 16)]

        def up2(t):
            return resize(t, scale_factor=2, mode='bilinear',
                          align_corners=True, warning=False)

        x0_0 = _DoubleConv(nb[0], name='conv0_0')(x, train=train)

        # pyramid towers: scale i gets i+1 stacked DoubleConvs
        towers = []
        tower_specs = [
            [('conv11_0', nb[0])],
            [('conv12_0', nb[0]), ('conv22_0', nb[1])],
            [('conv13_0', nb[0]), ('conv23_0', nb[1]), ('conv33_0', nb[2])],
            [('conv14_0', nb[0]), ('conv24_0', nb[1]), ('conv34_0', nb[2]),
             ('conv44_0', nb[3])],
        ]
        for img, spec in zip(images, tower_specs):
            t = img
            for name, c in spec:
                t = _DoubleConv(c, name=name)(t, train=train)
            towers.append(t)

        enc = [x0_0]
        prev = x0_0
        att_ints = [nb[0] // 2, nb[0], nb[1], nb[2]]
        for i in range(4):
            pooled = max_pool2d(prev, 2)
            att = AttentionBlock(att_ints[i], name=f'Attdw{i + 1}')(
                towers[i], pooled, train=train)
            prev = _DoubleConv(nb[i + 1], name=f'conv{i + 1}_0')(
                jnp.concatenate([att, pooled], axis=-1), train=train)
            enc.append(prev)
        x0_0, x1_0, x2_0, x3_0, x4_0 = enc

        def decoder(suffix):
            skips = [(x3_0, nb[3], nb[2], 'Att4', 'conv3_1'),
                     (x2_0, nb[2], nb[1], 'Att3', 'conv2_2'),
                     (x1_0, nb[1], nb[0], 'Att2', 'conv1_3'),
                     (x0_0, nb[0], nb[0] // 2, 'Att1', 'conv0_4')]
            y = x4_0
            for skip, c, f_int, att_name, conv_name in skips:
                up = up2(y)
                gated = AttentionBlock(f_int, name=att_name + suffix)(
                    up, skip, train=train)
                y = _DoubleConv(c, name=conv_name + suffix)(
                    jnp.concatenate([gated, up], axis=-1), train=train)
            return y

        out1 = decoder('')
        out2 = decoder('_2')  # computed and discarded, as in the reference
        output = Conv2d(self.num_classes, 1, name='final')(out1)
        _ = Conv2d(self.num_classes, 1, name='final2')(out2)
        return output
