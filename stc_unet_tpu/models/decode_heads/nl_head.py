"""NLHead + NonLocal2d (≙ reference ``decode_heads/nl_head.py`` + mmcv
NonLocal2d), and GCHead (``decode_heads/gc_head.py`` + mmcv ContextBlock)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..bricks import Conv2d, ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead
from .fcn_head import FCNHead


class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (mmcv ``NonLocal2d``)."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        g = Conv2d(inter, 1, name='g')(x).reshape(b, -1, inter)
        theta = Conv2d(inter, 1, name='theta')(x).reshape(b, -1, inter)
        phi = Conv2d(inter, 1, name='phi')(x).reshape(b, -1, inter)
        pairwise = jnp.einsum('bic,bjc->bij', theta, phi)
        if self.mode == 'embedded_gaussian':
            if self.use_scale:
                pairwise = pairwise / jnp.sqrt(float(inter))
            pairwise = jax.nn.softmax(pairwise, axis=-1)
        else:  # dot_product
            pairwise = pairwise / pairwise.shape[-1]
        y = jnp.einsum('bij,bjc->bic', pairwise, g).reshape(b, h, w, inter)
        y = ConvModule(c, 1, norm_cfg=self.norm_cfg, act_cfg=None,
                       name='conv_out')(y, train=train)
        return x + y


@HEADS.register_module()
class NLHead(FCNHead):
    """FCN head with a non-local block between the convs
    (reference ``nl_head.py``)."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_0')(x, train=train)
        feats = NonLocal2d(reduction=self.reduction,
                           use_scale=self.use_scale, mode=self.mode,
                           norm_cfg=self.norm_cfg,
                           name='nl_block')(feats, train=train)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_1')(feats, train=train)
        if self.concat_input:
            feats = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return self.cls_seg(feats, train=train)


class ContextBlock(nn.Module):
    """Global-context block (mmcv ``ContextBlock``, GCNet).

    ``fusion_types`` uses the mmcv vocabulary ``'channel_add'`` /
    ``'channel_mul'`` — an earlier ``'add'`` spelling silently routed
    config-driven ``('channel_add',)`` into the MULTIPLY branch."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)

    def __post_init__(self):
        assert self.pooling_type in ('avg', 'att')
        assert all(f in ('channel_add', 'channel_mul')
                   for f in self.fusion_types), \
            f'invalid fusion_types {self.fusion_types!r}'
        assert len(self.fusion_types) > 0, 'at least one fusion required'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        planes = int(c * self.ratio)
        if self.pooling_type == 'att':
            mask = Conv2d(1, 1, name='conv_mask')(x).reshape(b, -1, 1)
            mask = jax.nn.softmax(mask, axis=1)
            context = jnp.einsum('bpc,bpo->boc', x.reshape(b, -1, c), mask)
            context = context.reshape(b, 1, 1, c)
        else:
            context = jnp.mean(x, axis=(1, 2), keepdims=True)
        out = x
        for fusion in self.fusion_types:
            y = Conv2d(planes, 1, name=f'{fusion}_conv1')(context)
            # torch nn.LayerNorm eps (mmcv ContextBlock) is 1e-5, not
            # flax's 1e-6 default
            y = nn.LayerNorm(epsilon=1e-5, name=f'{fusion}_ln',
                             dtype=y.dtype)(y)
            y = nn.relu(y)
            y = Conv2d(c, 1, name=f'{fusion}_conv2')(y)
            if fusion == 'channel_add':
                out = out + y
            else:  # channel_mul (reference: sigmoid gate)
                out = out * nn.sigmoid(y)
        return out


@HEADS.register_module()
class GCHead(FCNHead):
    """FCN head with a global-context block (reference ``gc_head.py``)."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_0')(x, train=train)
        feats = ContextBlock(ratio=self.ratio,
                             pooling_type=self.pooling_type,
                             fusion_types=tuple(self.fusion_types),
                             name='gc_block')(feats, train=train)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name='convs_1')(feats, train=train)
        if self.concat_input:
            feats = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name='conv_cat')(
                jnp.concatenate([x, feats], axis=-1), train=train)
        return self.cls_seg(feats, train=train)
