"""SegformerHead (≙ reference ``decode_heads/segformer_head.py:144``):
per-level 1x1 MLP projections, upsample to the finest, concat, fuse."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class SegformerHead(BaseDecodeHead):
    """All-MLP SegFormer decoder."""
    interpolate_mode: str = 'bilinear'
    in_index: object = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        inputs = self._transform_inputs(inputs)
        outs = []
        for i, x in enumerate(inputs):
            x = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg,
                           name=f'convs_{i}')(x, train=train)
            outs.append(resize(x, size=inputs[0].shape[1:3],
                               mode=self.interpolate_mode,
                               align_corners=self.align_corners,
                               warning=False))
        out = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='fusion_conv')(
            jnp.concatenate(outs, axis=-1), train=train)
        return self.cls_seg(out, train=train)
