"""SETR decoder heads + SegmenterMaskTransformerHead
(≙ reference ``decode_heads/setr_up_head.py``, ``setr_mla_head.py``,
``segmenter_mask_head.py``)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, Linear
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class SETRUPHead(BaseDecodeHead):
    """SETR naive/progressive upsampling head."""
    num_convs: int = 1
    up_scale: int = 4
    kernel_size: int = 3
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``setr_up_head.py:41``
        assert self.kernel_size in (1, 3), 'kernel_size must be 1 or 3.'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        n, h, w, c = x.shape
        x = nn.LayerNorm(name='norm', dtype=x.dtype)(
            x.reshape(n, h * w, c)).reshape(n, h, w, c)
        for i in range(self.num_convs):
            x = ConvModule(self.channels, self.kernel_size,
                           padding=self.kernel_size // 2,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'up_convs_{i}')(x, train=train)
            x = resize(x, scale_factor=self.up_scale, mode='bilinear',
                       align_corners=self.align_corners, warning=False)
        return self.cls_seg(x, train=train)


@HEADS.register_module()
class SETRMLAHead(BaseDecodeHead):
    """SETR multi-level aggregation head."""
    mla_channels: int = 128
    in_index: object = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    up_scale: int = 4

    def __post_init__(self):
        # reference ``setr_mla_head.py:37``: the concat of per-level MLA
        # streams must equal ``channels``
        super().__post_init__()
        assert self.channels == len(self.in_channels) * self.mla_channels,             (f'channels ({self.channels}) must equal len(in_channels) '
             f'({len(self.in_channels)}) * mla_channels '
             f'({self.mla_channels})')

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        inputs = self._transform_inputs(inputs)
        outs = []
        for i, x in enumerate(inputs):
            x = ConvModule(self.mla_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'up_convs_{i}_0')(x, train=train)
            x = ConvModule(self.mla_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                           name=f'up_convs_{i}_1')(x, train=train)
            x = resize(x, scale_factor=self.up_scale, mode='bilinear',
                       align_corners=self.align_corners, warning=False)
            outs.append(x)
        out = jnp.concatenate(outs, axis=-1)
        return self.cls_seg(out, train=train)


@HEADS.register_module()
class SegmenterMaskTransformerHead(BaseDecodeHead):
    """Segmenter: class-embedding mask transformer
    (reference ``segmenter_mask_head.py``)."""
    num_layers: int = 2
    num_heads: int = 12
    embed_dims: int = 768
    mlp_ratio: int = 4
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from ..backbones.vit import _VitBlock
        x = self._transform_inputs(inputs)
        b, h, w, c = x.shape
        x = Linear(self.embed_dims, name='dec_proj')(
            x.reshape(b, h * w, c))
        cls_emb = self.param('cls_emb',
                             nn.initializers.truncated_normal(0.02),
                             (1, self.num_classes, self.embed_dims),
                             jnp.float32)
        cls_tokens = jnp.broadcast_to(
            cls_emb, (b, self.num_classes, self.embed_dims)).astype(x.dtype)
        x = jnp.concatenate([x, cls_tokens], axis=1)
        for i in range(self.num_layers):
            x = _VitBlock(self.embed_dims, self.num_heads,
                          float(self.mlp_ratio), True, self.drop_rate,
                          self.attn_drop_rate, self.drop_path_rate,
                          name=f'layers_{i}')(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name='decoder_norm', dtype=x.dtype)(x)
        patches = Linear(self.embed_dims, use_bias=False,
                         name='patch_proj')(x[:, :-self.num_classes])
        cls_seg_feat = Linear(self.embed_dims, use_bias=False,
                              name='classes_proj')(x[:, -self.num_classes:])
        patches = patches / jnp.linalg.norm(patches, axis=-1, keepdims=True)
        cls_seg_feat = cls_seg_feat / jnp.linalg.norm(
            cls_seg_feat, axis=-1, keepdims=True)
        masks = jnp.einsum('bpc,bkc->bpk', patches, cls_seg_feat)
        masks = nn.LayerNorm(epsilon=1e-5, name='mask_norm', dtype=masks.dtype)(masks)
        return masks.reshape(b, h, w, self.num_classes)
