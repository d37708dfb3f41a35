"""CascadeEncoderDecoder (≙ reference ``segmentors/cascade_encoder_decoder.py:12``).

N-stage cascaded heads: stage i refines stage i-1's logits
(reference ``:52-65``). Reuses all EncoderDecoder inference machinery by
overriding the net's head composition.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.core.utils import add_prefix
from stc_unet_tpu.ops import resize
from .. import builder
from ..builder import SEGMENTORS
from .base import BaseSegmentor
from .encoder_decoder import EncoderDecoder, EncoderDecoderNet


class CascadeNet(EncoderDecoderNet):
    """Pure compute graph for the cascade: decode_head is a tuple; stage 0
    sees features only, stages 1+ see (features, prev_logits)."""

    def __call__(self, img, train: bool = False):
        x = self.extract(img, train=train)
        out = self.decode_head[0](x, train=train)
        for i in range(1, len(self.decode_head)):
            out = self.decode_head[i](x, out, train=train)
        out = resize(out, size=img.shape[1:3], mode='bilinear',
                     align_corners=self.align_corners, warning=False)
        return out

    def forward_heads(self, img, train: bool = True):
        x = self.extract(img, train=train)
        outs = {}
        prev = self.decode_head[0](x, train=train)
        outs['decode_0'] = prev
        for i in range(1, len(self.decode_head)):
            prev = self.decode_head[i](x, prev, train=train)
            outs[f'decode_{i}'] = prev
        if self.auxiliary_head is not None:
            for i, head in enumerate(self.auxiliary_head):
                outs[f'aux_{i}'] = head(x, train=train)
        return outs


@SEGMENTORS.register_module()
class CascadeEncoderDecoder(EncoderDecoder):
    """Cascade segmentor: ``decode_head`` is a list of head cfgs."""

    def __init__(self, num_stages, backbone, decode_head, neck=None,
                 auxiliary_head=None, train_cfg=None, test_cfg=None,
                 pretrained=None, init_cfg=None):
        self.num_stages = num_stages
        super().__init__(backbone=backbone, decode_head=decode_head,
                         neck=neck, auxiliary_head=auxiliary_head,
                         train_cfg=train_cfg, test_cfg=test_cfg,
                         pretrained=pretrained, init_cfg=init_cfg)
        # replace the plain net with the cascade-aware one
        self.net = CascadeNet(
            backbone=self.backbone, decode_head=self.decode_head,
            neck=self.neck, auxiliary_head=self.auxiliary_head,
            align_corners=self.align_corners)

    def _init_decode_head(self, decode_head):
        assert isinstance(decode_head, list)
        assert len(decode_head) == self.num_stages
        self.decode_head = tuple(builder.build_head(c) for c in decode_head)
        last = self.decode_head[-1]
        self.align_corners = last.align_corners
        self.num_classes = last.num_classes
        self.out_channels = last.final_out_channels

    def compute_losses(self, variables, img, gt_semantic_seg, rng,
                       train: bool = True):
        gt = jnp.asarray(gt_semantic_seg)
        if gt.ndim == 4:
            gt = gt[..., 0] if gt.shape[-1] == 1 else gt[:, 0]
        outs, new_state = self.net.apply(
            variables, jnp.asarray(img), train=train,
            rngs={'dropout': rng}, mutable=['batch_stats'],
            method=CascadeNet.forward_heads)
        losses = {}
        for i, head in enumerate(self.decode_head):
            losses.update(add_prefix(
                head.loss_by_feat(outs[f'decode_{i}'], gt), f'decode_{i}'))
        if self.auxiliary_head is not None:
            for i, head in enumerate(self.auxiliary_head):
                prefix = 'aux' if len(self.auxiliary_head) == 1 \
                    else f'aux_{i}'
                losses.update(add_prefix(
                    head.loss_by_feat(outs[f'aux_{i}'], gt), prefix))
        return losses, new_state
