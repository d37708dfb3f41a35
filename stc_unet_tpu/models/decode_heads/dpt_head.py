"""DPTHead (≙ reference ``decode_heads/dpt_head.py``, 294 LoC): reassemble
ViT tokens into a pyramid, fuse with residual conv units."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import Conv2d, ConvModule, Linear
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class ReassembleBlocks(nn.Module):
    """Project + rescale ViT feature maps to 4 pyramid levels."""
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for i, x in enumerate(inputs):
            if isinstance(x, (tuple, list)):
                # ViT with_cls_token output: (feature_map, cls_token) —
                # readout branches per reference dpt_head.py ReassembleBlocks
                x, cls_token = x
                if self.readout_type == 'project':
                    b, h, w, c = x.shape
                    tokens = x.reshape(b, h * w, c)
                    cls = jnp.broadcast_to(cls_token[:, None, :],
                                           tokens.shape)
                    tokens = Linear(c, name=f'readout_projects_{i}')(
                        jnp.concatenate([tokens, cls], axis=-1))
                    # torch GELU is the exact erf form (flax defaults to
                    # the tanh approximation)
                    x = nn.gelu(tokens,
                                approximate=False).reshape(b, h, w, c)
                elif self.readout_type == 'add':
                    x = x + cls_token[:, None, None, :]
                # 'ignore': drop the cls token
            x = Conv2d(self.post_process_channels[i], 1,
                       name=f'projects_{i}')(x)
            # resize: stages get strides 4, 8, 16, 32 from a /16 base
            factor = [4, 2, 1, 0.5][i] if len(inputs) == 4 else 1
            if factor > 1:
                x = nn.ConvTranspose(
                    self.post_process_channels[i],
                    (int(factor), int(factor)),
                    strides=(int(factor), int(factor)), padding='VALID',
                    dtype=x.dtype, name=f'resize_layers_{i}')(x)
            elif factor < 1:
                x = Conv2d(self.post_process_channels[i], 3, 2, padding=1,
                           name=f'resize_layers_{i}')(x)
            outs.append(x)
        return outs


class PreActResidualConvUnit(nn.Module):
    channels: int
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.relu(x)
        y = ConvModule(self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=None, order=('conv', 'norm', 'act'),
                       name='conv1')(y, train=train)
        y = nn.relu(y)
        y = ConvModule(self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
                       act_cfg=None, name='conv2')(y, train=train)
        return x + y


class FeatureFusionBlock(nn.Module):
    channels: int
    norm_cfg: Optional[dict] = None
    expand: bool = False
    align_corners: bool = True

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        if skip is not None:
            # reference dpt_head.py:196-203: mismatched skips resize to x
            # (align_corners=False here, regardless of self.align_corners)
            if skip.shape[1:3] != x.shape[1:3]:
                skip = resize(skip, size=x.shape[1:3], mode='bilinear',
                              align_corners=False, warning=False)
            x = x + PreActResidualConvUnit(
                self.channels, self.norm_cfg, name='res_conv_unit1')(
                skip, train=train)
        x = PreActResidualConvUnit(self.channels, self.norm_cfg,
                                   name='res_conv_unit2')(x, train=train)
        x = resize(x, scale_factor=2, mode='bilinear',
                   align_corners=self.align_corners, warning=False)
        out_ch = self.channels // 2 if self.expand else self.channels
        return ConvModule(out_ch, 1, act_cfg=None,
                          name='project')(x, train=train)


@HEADS.register_module()
class DPTHead(BaseDecodeHead):
    """Dense prediction transformer head."""
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'
    patch_size: int = 16
    expand_channels: bool = False
    in_index: object = (0, 1, 2, 3)

    def __post_init__(self):
        # ≙ reference ``dpt_head.py:35``; input_transform is NOT defaulted
        # (the reference requires configs to pass 'multiple_select'
        # explicitly — test_dpt_head.py:10-16 pins the failure otherwise)
        assert self.readout_type in ('ignore', 'add', 'project'), \
            f'invalid readout_type {self.readout_type!r}'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        # reference dpt_head.py:253-255: expand_channels scales level i's
        # post-process width by 2**i
        ppc = tuple(int(c * 2 ** i) if self.expand_channels else int(c)
                    for i, c in enumerate(self.post_process_channels))
        x = ReassembleBlocks(self.embed_dims, ppc, self.readout_type,
                             name='reassemble_blocks')(x, train=train)
        # reference dpt_head.py:259-266: bias=False (our ConvModule's
        # 'auto' would add one since there is no norm)
        x = [ConvModule(self.channels, 3, padding=1, act_cfg=None,
                        bias=False, name=f'convs_{i}')(f, train=train)
             for i, f in enumerate(x)]
        out = FeatureFusionBlock(self.channels, self.norm_cfg,
                                 name='fusion_blocks_0')(x[-1], train=train)
        for i in range(1, len(x)):
            out = FeatureFusionBlock(
                self.channels, self.norm_cfg,
                name=f'fusion_blocks_{i}')(out, x[-(i + 1)], train=train)
        # reference dpt_head.py:272-277: project is a FULL ConvModule —
        # mmcv's default act is ReLU (our brick defaults to None)
        out = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg or dict(type='ReLU'),
                         name='project')(out, train=train)
        return self.cls_seg(out, train=train)
