"""OCRHead (≙ reference ``decode_heads/ocr_head.py``): object-contextual
representations — soft class regions gather object features, then pixels
attend to object tokens. Cascade stage (needs prev logits).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..bricks import ConvModule
from ..builder import HEADS
from ..utils.self_attention_block import SelfAttentionBlock
from .cascade_decode_head import BaseCascadeDecodeHead


class SpatialGatherModule(nn.Module):
    """Aggregate pixel features per (soft) object region."""
    scale: float = 1.0

    @nn.compact
    def __call__(self, feats, probs):
        """feats (B, H, W, C); probs (B, H, W, K) → (B, K, C)."""
        b, h, w, c = feats.shape
        k = probs.shape[-1]
        probs = probs.reshape(b, h * w, k)
        feats = feats.reshape(b, h * w, c)
        probs = jax.nn.softmax(self.scale * probs, axis=1)
        return jnp.einsum('bpk,bpc->bkc', probs, feats)


class ObjectAttentionBlock(SelfAttentionBlock):
    """Pixel→object attention (reference ObjectAttentionBlock)."""

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = False):
        context = super().__call__(query_feats, key_feats, train=train)
        out = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                         act_cfg=self.act_cfg, name='bottleneck')(
            jnp.concatenate([context, query_feats], axis=-1), train=train)
        return out


@HEADS.register_module()
class OCRHead(BaseCascadeDecodeHead):
    """Object-Contextual Representations head."""
    ocr_channels: int = 256
    scale: int = 1

    @nn.compact
    def __call__(self, inputs, prev_output, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='bottleneck')(x, train=train)
        from stc_unet_tpu.ops import resize
        prev = resize(prev_output, size=feats.shape[1:3], mode='bilinear',
                      align_corners=self.align_corners, warning=False)
        context = SpatialGatherModule(self.scale,
                                      name='spatial_gather_module')(
            feats, prev)
        object_context = ObjectAttentionBlock(
            key_in_channels=self.channels,
            query_in_channels=self.channels,
            channels=self.ocr_channels,
            out_channels=self.channels,
            share_key_query=False,
            key_query_num_convs=2, value_out_num_convs=1,
            key_query_norm=True, value_out_norm=True, matmul_norm=True,
            with_out=True, norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            name='object_context_block')(feats, context, train=train)
        return self.cls_seg(object_context, train=train)
