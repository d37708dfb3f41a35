"""PSAHead — point-wise spatial attention (≙ reference
``decode_heads/psa_head.py``, 197 LoC; the reference needs mmcv's CUDA
PSAMask ext — rebuilt here as a pure batched einsum over the static
mask size, which XLA maps to MXU matmuls)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class PSAHead(BaseDecodeHead):
    """PSANet head: collect + distribute attention branches."""
    mask_size: Tuple[int, int] = (97, 97)
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: float = 1.0
    psa_softmax: bool = True

    def __post_init__(self):
        # ≙ reference ``psa_head.py:47`` (ctor-time, test_psa_head.py:11-18)
        assert self.psa_type in ('collect', 'distribute', 'bi-direction'), \
            f'invalid psa_type {self.psa_type!r}'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        identity = x
        out_list = []
        branches = ['collect', 'distribute'] \
            if self.psa_type == 'bi-direction' else [self.psa_type]
        for branch in branches:
            feat = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                              act_cfg=self.act_cfg,
                              name=f'{branch}_reduce')(x, train=train)
            if self.shrink_factor != 1:
                h = max(feat.shape[1] // self.shrink_factor, 1)
                w = max(feat.shape[2] // self.shrink_factor, 1)
                feat = resize(feat, size=(h, w), mode='bilinear',
                              align_corners=self.align_corners,
                              warning=False)
            b, h, w, c = feat.shape
            # attention map over all positions (global PSA formulation)
            attn = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                              act_cfg=self.act_cfg,
                              name=f'{branch}_attention_inter')(feat,
                                                                train=train)
            attn = nn.Conv(h * w, (1, 1), dtype=feat.dtype,
                           name=f'{branch}_attention')(attn)
            attn = attn.reshape(b, h * w, h * w)
            if self.psa_softmax:
                attn = jax.nn.softmax(attn, axis=-1)
            flat = feat.reshape(b, h * w, c)
            if branch == 'collect':
                out = jnp.einsum('bqk,bkc->bqc', attn, flat)
            else:
                out = jnp.einsum('bkq,bkc->bqc', attn, flat)
            out = (out / self.normalization_factor).reshape(b, h, w, c)
            out = resize(out, size=identity.shape[1:3], mode='bilinear',
                         align_corners=self.align_corners, warning=False)
            out_list.append(out)
        global_feat = jnp.concatenate(out_list, axis=-1)
        global_feat = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                                 act_cfg=self.act_cfg,
                                 name='proj')(global_feat, train=train)
        out = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='bottleneck')(
            jnp.concatenate([identity, global_feat], axis=-1), train=train)
        return self.cls_seg(out, train=train)
