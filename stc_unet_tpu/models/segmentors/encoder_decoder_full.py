"""EncoderDecoderFull: backbone-less segmentor for monolithic nets.

≙ reference ``segmentors/encoder_decoder.py:335``: the decode head consumes
the raw image (SwinUNet / TransUNet / UNet++ / DC-UNet style monolithic
models). Expressed TPU-natively as :class:`EncoderDecoder` with an identity
backbone, so all jitted inference paths (incl. batched-tile slide inference)
are shared.
"""
from __future__ import annotations

import flax.linen as nn

from ..builder import BACKBONES, SEGMENTORS
from .encoder_decoder import EncoderDecoder


@BACKBONES.register_module()
class IdentityBackbone(nn.Module):
    """Pass-through backbone: the head sees the raw image."""
    in_channels: int = 3

    def __call__(self, x, train: bool = False):
        return x


@SEGMENTORS.register_module()
class EncoderDecoderFull(EncoderDecoder):

    def __init__(self, decode_head, pretrained=None, train_cfg=None,
                 test_cfg=None, init_cfg=None, **kwargs):
        super().__init__(
            backbone=dict(type='IdentityBackbone'),
            decode_head=decode_head, train_cfg=train_cfg, test_cfg=test_cfg,
            pretrained=None, init_cfg=init_cfg)
