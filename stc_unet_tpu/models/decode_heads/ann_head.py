"""ANNHead (≙ reference ``decode_heads/ann_head.py``, 246 LoC):
asymmetric non-local — AFNB fuses low/high levels with pyramid-sampled keys,
APNB refines the bottleneck. Both blocks sum one attention stage per
``query_scale`` (maxpool-downsampled queries), then concat with the identity
and project through a 1x1 bottleneck.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..bricks import ConvModule, Dropout2d, adaptive_avg_pool2d
from ..builder import HEADS
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


def ppm_concat(feats, pool_scales):
    """Flatten-and-concat pyramid pooling over several scales
    (reference ``ann_head.py:11-30``): (B, H, W, C) → (B, K, C) tokens."""
    b, _, _, c = feats.shape
    outs = []
    for scale in pool_scales:
        p = adaptive_avg_pool2d(feats, scale)
        outs.append(p.reshape(b, -1, c))
    return jnp.concatenate(outs, axis=1)  # (B, K, C)


class PPMConcat(nn.Module):
    """Module wrapper over ``ppm_concat`` (reference PPMConcat is an
    nn.ModuleList; stateless here)."""
    pool_scales: Sequence[int] = (1, 3, 6, 8)

    def __call__(self, feats):
        return ppm_concat(feats, self.pool_scales)


class _PyramidKeyAttention(SelfAttentionBlock):
    """ANN's SelfAttentionBlock (reference ``ann_head.py:33-80``): the
    PROJECTED key/value maps are PPM-sampled into tokens (reference applies
    ``key_psp`` as ``key_downsample``, i.e. after the projections — the key
    projection's ReLU does not commute with pooling, so pooling first is
    numerically wrong; caught by test_stock_head_oracles). Queries are
    optionally maxpool-downsampled via ``query_downsample`` (int).

    Reference flag set: key_query_num_convs=1, key_query_norm=True,
    value_out_num_convs=1, value_out_norm=False, matmul_norm=True,
    with_out=True (→ plain-conv zero-init out_project)."""
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)

    def _key_value_downsample(self, key, value):
        return (ppm_concat(key, self.key_pool_scales),
                ppm_concat(value, self.key_pool_scales))


class AFNB(nn.Module):
    """Asymmetric fusion non-local block (reference ``ann_head.py:83-132``):
    sum of per-query-scale attention stages, concat with the high-level
    identity, 1x1 bottleneck with NO activation."""
    low_in_channels: int
    high_in_channels: int
    channels: int
    out_channels: int
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, low_feats, high_feats, train: bool = False):
        priors = [
            _PyramidKeyAttention(
                key_in_channels=self.low_in_channels,
                query_in_channels=self.high_in_channels,
                channels=self.channels, out_channels=self.out_channels,
                share_key_query=False,
                query_downsample=qs if qs > 1 else None,
                key_query_num_convs=1, value_out_num_convs=1,
                key_query_norm=True, value_out_norm=False,
                matmul_norm=True, with_out=True,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                key_pool_scales=tuple(self.key_pool_scales),
                name=f'stages_{i}')(high_feats, low_feats, train=train)
            for i, qs in enumerate(self.query_scales)
        ]
        context = sum(priors)
        return ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                          act_cfg=None, name='bottleneck')(
            jnp.concatenate([context, high_feats], axis=-1), train=train)


class APNB(nn.Module):
    """Asymmetric pyramid non-local block (reference ``ann_head.py:135-182``):
    self-attention variant of AFNB with shared key/query projection and an
    ACTIVATED 1x1 bottleneck."""
    in_channels: int
    channels: int
    out_channels: int
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        priors = [
            _PyramidKeyAttention(
                key_in_channels=self.in_channels,
                query_in_channels=self.in_channels,
                channels=self.channels, out_channels=self.out_channels,
                share_key_query=True,
                query_downsample=qs if qs > 1 else None,
                key_query_num_convs=1, value_out_num_convs=1,
                key_query_norm=True, value_out_norm=False,
                matmul_norm=True, with_out=True,
                norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                key_pool_scales=tuple(self.key_pool_scales),
                name=f'stages_{i}')(feats, feats, train=train)
            for i, qs in enumerate(self.query_scales)
        ]
        context = sum(priors)
        return ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                          act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate([context, feats], axis=-1), train=train)


@HEADS.register_module()
class ANNHead(BaseDecodeHead):
    """Asymmetric non-local head (reference ``ann_head.py:185-246``);
    expects two input levels: AFNB(low→high) → dropout → 3x3 bottleneck →
    APNB → cls_seg."""
    project_channels: int = 256
    in_index: object = (-2, -1)
    input_transform: str = 'multiple_select'
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        low_feats, high_feats = self._transform_inputs(inputs)
        high_c = high_feats.shape[-1]
        output = AFNB(
            low_in_channels=low_feats.shape[-1], high_in_channels=high_c,
            channels=self.project_channels, out_channels=high_c,
            query_scales=tuple(self.query_scales),
            key_pool_scales=tuple(self.key_pool_scales),
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='fusion')(low_feats, high_feats, train=train)
        # reference forward applies the HEAD dropout between fusion and
        # bottleneck (``ann_head.py:240``) in addition to cls_seg's own
        if self.dropout_ratio > 0:
            output = Dropout2d(self.dropout_ratio, name='fusion_dropout')(
                output, train=train)
        output = ConvModule(self.channels, 3, padding=1,
                            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                            name='bottleneck')(output, train=train)
        output = APNB(
            in_channels=self.channels, channels=self.project_channels,
            out_channels=self.channels,
            query_scales=tuple(self.query_scales),
            key_pool_scales=tuple(self.key_pool_scales),
            norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='context')(output, train=train)
        return self.cls_seg(output, train=train)
