"""MultiLevelNeck / Feature2Pyramid / MLANeck
(≙ reference ``necks/multilevel_neck.py``, ``featurepyramid.py``,
``mla_neck.py``)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, ConvModule
from ..builder import NECKS


@NECKS.register_module()
class MultiLevelNeck(nn.Module):
    """Rescale a (possibly single) feature to multiple scales (ViT necks)."""
    in_channels: Sequence[int] = (768,)
    out_channels: int = 768
    scales: Sequence[float] = (0.5, 1, 2, 4)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        # reference multilevel_neck.py passes norm_cfg/act_cfg into both
        # conv banks (defaults None — identity)
        inputs = [
            ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'lateral_convs_{i}')(x, train=train)
            for i, x in enumerate(inputs)
        ]
        outs = []
        for i, scale in enumerate(self.scales):
            x_resize = inputs[i] if len(inputs) > 1 else inputs[0]
            if scale != 1:
                h = int(x_resize.shape[1] * scale)
                w = int(x_resize.shape[2] * scale)
                x_resize = resize(x_resize, size=(h, w), mode='bilinear',
                                  align_corners=False, warning=False)
            outs.append(ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg,
                name=f'convs_{i}')(x_resize, train=train))
        return outs


@NECKS.register_module()
class Feature2Pyramid(nn.Module):
    """Upsample ViT features into a pyramid (BEiT/MAE necks)."""
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)
    norm_cfg: Optional[dict] = None

    def __post_init__(self):
        # ≙ reference ``featurepyramid.py:50`` — only these five rescale
        # factors have a defined op (test_feature2pyramid.py:36-38)
        for k in self.rescales:
            if k not in (4, 2, 1, 0.5, 0.25):
                raise KeyError(f'invalid {k} for feature2pyramid')
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.rescales)
        outs = []
        for i, k in enumerate(self.rescales):
            x = inputs[i]
            if k == 4:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     padding='VALID', name=f'up4_deconv1_{i}',
                                     dtype=x.dtype)(x)
                x = BatchNorm(name=f'up4_bn_{i}')(x, train=train)
                x = nn.gelu(x, approximate=False)
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     padding='VALID', name=f'up4_deconv2_{i}',
                                     dtype=x.dtype)(x)
            elif k == 2:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     padding='VALID', name=f'up2_deconv_{i}',
                                     dtype=x.dtype)(x)
            elif k == 1:
                pass
            elif k == 0.5:
                from ..bricks import max_pool2d
                x = max_pool2d(x, 2, 2)
            elif k == 0.25:
                from ..bricks import max_pool2d
                x = max_pool2d(x, 4, 4)
            else:
                raise KeyError(f'invalid rescale {k}')
            outs.append(x)
        return outs


@NECKS.register_module()
class MLANeck(nn.Module):
    """Multi-level feature aggregation (SETR-MLA)."""
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    out_channels: int = 256
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        # channel-project each level
        feats = []
        for i, x in enumerate(inputs):
            x = nn.LayerNorm(name=f'norm_{i}', dtype=x.dtype)(
                x.reshape(x.shape[0], -1, x.shape[-1])).reshape(x.shape)
            # reference MLAModule passes act_cfg through unchanged
            # (default None — no activation)
            feats.append(ConvModule(
                self.out_channels, 1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg,
                name=f'mla_convs1_{i}')(x, train=train))
        # top-down cumulative aggregation, TOP level first — the reference
        # (mla_neck.py:36-59) reverses to [p5..p2], accumulates
        # m5=p5, m4=p5+p4, ..., and returns (conv0(m5), ..., conv3(m2))
        # in that top-first order.
        agg = []
        prev = None
        for f in feats[::-1]:
            prev = f if prev is None else prev + f
            agg.append(prev)
        outs = [
            ConvModule(self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'mla_convs2_{i}')(x, train=train)
            for i, x in enumerate(agg)
        ]
        return outs
