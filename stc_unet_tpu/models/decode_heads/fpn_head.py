"""FPNHead (≙ reference ``decode_heads/fpn_head.py``): per-level conv-up
pyramids summed then classified."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import numpy as np

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule
from ..builder import HEADS
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class FPNHead(BaseDecodeHead):
    """Panoptic-FPN style semantic head."""
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    in_index: object = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        assert len(self.feature_strides) == len(x)
        output = None
        for i in range(len(self.feature_strides)):
            head_length = max(
                1, int(np.log2(self.feature_strides[i]) -
                       np.log2(self.feature_strides[0])))
            f = x[i]
            for k in range(head_length):
                f = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                               name=f'scale_heads_{i}_{k}')(f, train=train)
                if self.feature_strides[i] != self.feature_strides[0]:
                    f = resize(f, scale_factor=2, mode='bilinear',
                               align_corners=self.align_corners,
                               warning=False)
            output = f if output is None else output + f
        return self.cls_seg(output, train=train)
