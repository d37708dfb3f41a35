"""TransUNet head (≙ reference ``decode_heads/transunet_head.py:8-160``).

ResNet-ish conv encoder (stride-2 bottlenecks) → ViT over the /16 feature
map → conv decoder with skip concats and bilinear x2 upsampling.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d
from ..builder import HEADS
from .decode_head import BaseDecodeHead
from .vit import ViT


class EncoderBottleneck(nn.Module):
    """1x1 → 3x3(s2) → 1x1 with a strided 1x1 shortcut
    (reference ``transunet_head.py:8``)."""
    out_channels: int
    stride: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.out_channels * (self.base_width / 64))
        down = Conv2d(self.out_channels, 1, self.stride, use_bias=False,
                      name='downsample_0')(x)
        down = BatchNorm(name='downsample_1')(down, train=train)
        x = Conv2d(width, 1, 1, use_bias=False, name='conv1')(x)
        x = nn.relu(BatchNorm(name='norm1')(x, train=train))
        x = Conv2d(width, 3, 2, padding=1, use_bias=False, name='conv2')(x)
        x = nn.relu(BatchNorm(name='norm2')(x, train=train))
        x = Conv2d(self.out_channels, 1, 1, use_bias=False, name='conv3')(x)
        x = BatchNorm(name='norm3')(x, train=train)
        return nn.relu(x + down)


class DecoderBottleneck(nn.Module):
    """Bilinear x2 upsample (+skip concat) → double conv
    (reference ``transunet_head.py:49``)."""
    out_channels: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, x_concat=None, train: bool = False):
        x = resize(x, scale_factor=self.scale_factor, mode='bilinear',
                   align_corners=True, warning=False)
        if x_concat is not None:
            x = jnp.concatenate([x_concat, x], axis=-1)
        x = Conv2d(self.out_channels, 3, 1, padding=1, name='layer_0')(x)
        x = nn.relu(BatchNorm(name='layer_1')(x, train=train))
        x = Conv2d(self.out_channels, 3, 1, padding=1, name='layer_3')(x)
        x = nn.relu(BatchNorm(name='layer_4')(x, train=train))
        return x


class TransUNetModule(BaseDecodeHead):
    """Monolithic TransUNet (reference ``transunet_head.py:133``).

    Config (``my_config/TransUnet.py``): img_dim=512, out_channels=128,
    head_num=4, mlp_dim=512, block_num=8, patch_dim=16, class_num=2.
    """
    img_dim: int = 512
    out_ch: int = 128
    head_num: int = 4
    mlp_dim: int = 512
    block_num: int = 8
    patch_dim: int = 16
    class_num: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_ch
        # encoder (reference transunet_head.py:73)
        x = Conv2d(oc, 7, 2, padding=3, use_bias=False, name='conv1')(x)
        x1 = nn.relu(BatchNorm(name='norm1')(x, train=train))
        x2 = EncoderBottleneck(oc * 2, stride=2, name='encoder1')(
            x1, train=train)
        x3 = EncoderBottleneck(oc * 4, stride=2, name='encoder2')(
            x2, train=train)
        x = EncoderBottleneck(oc * 8, stride=2, name='encoder3')(
            x3, train=train)
        vit_img_dim = self.img_dim // self.patch_dim
        x = ViT(vit_img_dim, oc * 8, oc * 8, self.head_num, self.mlp_dim,
                self.block_num, patch_dim=1, classification=False,
                name='vit')(x, train=train)
        b, t, c = x.shape
        side = int(round(t ** 0.5))
        x = x.reshape(b, side, side, c)
        x = Conv2d(512, 3, 1, padding=1, name='conv2')(x)
        x = nn.relu(BatchNorm(name='norm2')(x, train=train))
        # decoder (reference transunet_head.py:111)
        x = DecoderBottleneck(oc * 2, name='decoder1')(x, x3, train=train)
        x = DecoderBottleneck(oc, name='decoder2')(x, x2, train=train)
        x = DecoderBottleneck(oc // 2, name='decoder3')(x, x1, train=train)
        x = DecoderBottleneck(oc // 8, name='decoder4')(x, None, train=train)
        return Conv2d(self.class_num, 1, name='conv_out')(x)


def TransUNet(img_dim=512, out_channels=128, head_num=4, mlp_dim=512,
              block_num=8, patch_dim=16, class_num=2, **kwargs):
    """Config-facing factory: the reference reuses the name
    ``out_channels`` for the encoder width; BaseDecodeHead's own
    ``out_channels`` stays at its default."""
    return TransUNetModule(img_dim=img_dim, out_ch=out_channels,
                           head_num=head_num, mlp_dim=mlp_dim,
                           block_num=block_num, patch_dim=patch_dim,
                           class_num=class_num, **kwargs)


HEADS.register_module(name='TransUNet', module=TransUNet)
