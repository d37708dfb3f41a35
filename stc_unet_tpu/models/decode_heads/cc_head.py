"""CCHead — criss-cross attention (≙ reference ``decode_heads/cc_head.py``;
the reference needs mmcv's CUDA CrissCrossAttention ext — here it is pure
jnp: row+column attention as two batched einsums, recurrence twice).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..bricks import Conv2d, ConvModule
from ..builder import HEADS
from .fcn_head import FCNHead


class CrissCrossAttention(nn.Module):
    """Attention restricted to each pixel's row and column."""
    in_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = self.in_channels // 8
        q = Conv2d(inter, 1, name='query_conv')(x)
        k = Conv2d(inter, 1, name='key_conv')(x)
        v = Conv2d(self.in_channels, 1, name='value_conv')(x)
        # row attention: for each (i, j): keys along row i
        e_row = jnp.einsum('bijc,bikc->bijk', q, k)  # (B, H, W, W)
        # col attention: keys along column j
        e_col = jnp.einsum('bijc,bkjc->bijk', q, k)  # (B, H, W, H)
        # mask self in the column term (the pixel already attends to itself
        # via the row term — mmcv's CCA applies -inf on the column diag)
        e_col = e_col - 1e9 * jnp.eye(h, dtype=e_col.dtype)[None, :, None, :]
        energy = jnp.concatenate([e_row, e_col], axis=-1)
        attn = jax.nn.softmax(energy, axis=-1)
        a_row, a_col = attn[..., :w], attn[..., w:]
        out = jnp.einsum('bijk,bikc->bijc', a_row, v) + \
            jnp.einsum('bijk,bkjc->bijc', a_col, v)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return gamma * out + x


@HEADS.register_module()
class CCHead(FCNHead):
    """FCN head with recurrent criss-cross attention."""
    recurrence: int = 2

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_0')(x, train=train)
        cca = CrissCrossAttention(self.channels, name='cca')
        for _ in range(self.recurrence):
            feats = cca(feats)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_1')(feats, train=train)
        if self.concat_input:
            feats = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return self.cls_seg(feats, train=train)


@HEADS.register_module()
class DepthwiseSeparableFCNHead(FCNHead):
    """FCNHead with depthwise-separable convs (Fast-SCNN's head,
    ≙ reference ``decode_heads/sep_fcn_head.py``)."""

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from ..bricks import DepthwiseSeparableConvModule
        x = self._transform_inputs(inputs)
        feats = x
        for i in range(self.num_convs):
            feats = DepthwiseSeparableConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg,
                name=f'convs_{i}')(feats, train=train)
        if self.concat_input and self.num_convs > 0:
            feats = DepthwiseSeparableConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return self.cls_seg(feats, train=train)
