"""ANNHead (≙ reference ``decode_heads/ann_head.py``, 246 LoC):
asymmetric non-local — AFNB fuses low/high levels with pyramid-sampled keys,
APNB refines the bottleneck.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import ConvModule, adaptive_avg_pool2d
from ..builder import HEADS
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class PPMConcat(nn.Module):
    """Flatten-and-concat pyramid pooling over several scales."""
    pool_scales: Sequence[int] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, feats):
        b, _, _, c = feats.shape
        outs = []
        for scale in self.pool_scales:
            p = adaptive_avg_pool2d(feats, scale)
            outs.append(p.reshape(b, -1, c))
        return jnp.concatenate(outs, axis=1)  # (B, K, C)


class _PyramidKeyAttention(SelfAttentionBlock):
    """SelfAttentionBlock whose keys/values are PPM-sampled tokens."""
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = False):
        key_tokens = PPMConcat(tuple(self.key_pool_scales),
                               name='key_psp')(key_feats)
        context = super().__call__(query_feats, key_tokens, train=train)
        return context


@HEADS.register_module()
class ANNHead(BaseDecodeHead):
    """Asymmetric non-local head; expects two input levels."""
    project_channels: int = 256
    in_index: object = (-2, -1)
    input_transform: str = 'multiple_select'
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        low_feats, high_feats = self._transform_inputs(inputs)
        high_c = high_feats.shape[-1]
        # AFNB: fuse low into high
        context = _PyramidKeyAttention(
            key_in_channels=low_feats.shape[-1],
            query_in_channels=high_c,
            channels=self.project_channels, out_channels=high_c,
            share_key_query=False, key_query_num_convs=1,
            value_out_num_convs=1, key_query_norm=False,
            value_out_norm=False, matmul_norm=True, with_out=True,
            norm_cfg=self.norm_cfg, act_cfg=None,
            query_scales=tuple(self.query_scales),
            key_pool_scales=tuple(self.key_pool_scales),
            name='fusion')(high_feats, low_feats, train=train)
        output = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                            act_cfg=self.act_cfg, name='bottleneck')(
            context + high_feats, train=train)
        # APNB: self-refine
        context2 = _PyramidKeyAttention(
            key_in_channels=self.channels,
            query_in_channels=self.channels,
            channels=self.project_channels, out_channels=self.channels,
            share_key_query=True, key_query_num_convs=1,
            value_out_num_convs=1, key_query_norm=False,
            value_out_norm=False, matmul_norm=True, with_out=True,
            norm_cfg=self.norm_cfg, act_cfg=None,
            query_scales=tuple(self.query_scales),
            key_pool_scales=tuple(self.key_pool_scales),
            name='context')(output, output, train=train)
        output = ConvModule(self.channels, 3, padding=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='context_bottleneck')(
            context2 + output, train=train)
        return self.cls_seg(output, train=train)
