"""MobileNetV3 backbone (≙ reference ``backbones/mobilenet_v3.py``)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from ..bricks import ConvModule
from ..builder import BACKBONES
from ..utils.inverted_residual import InvertedResidualV3

# k, mid, out, with_se, act, stride — mmseg arch tables
_ARCH = {
    'small': [
        [3, 16, 16, True, 'ReLU', 2], [3, 72, 24, False, 'ReLU', 2],
        [3, 88, 24, False, 'ReLU', 1], [5, 96, 40, True, 'HSwish', 2],
        [5, 240, 40, True, 'HSwish', 1], [5, 240, 40, True, 'HSwish', 1],
        [5, 120, 48, True, 'HSwish', 1], [5, 144, 48, True, 'HSwish', 1],
        [5, 288, 96, True, 'HSwish', 2], [5, 576, 96, True, 'HSwish', 1],
        [5, 576, 96, True, 'HSwish', 1]],
    'large': [
        [3, 16, 16, False, 'ReLU', 1], [3, 64, 24, False, 'ReLU', 2],
        [3, 72, 24, False, 'ReLU', 1], [5, 72, 40, True, 'ReLU', 2],
        [5, 120, 40, True, 'ReLU', 1], [5, 120, 40, True, 'ReLU', 1],
        [3, 240, 80, False, 'HSwish', 2], [3, 200, 80, False, 'HSwish', 1],
        [3, 184, 80, False, 'HSwish', 1], [3, 184, 80, False, 'HSwish', 1],
        [3, 480, 112, True, 'HSwish', 1], [3, 672, 112, True, 'HSwish', 1],
        [5, 672, 160, True, 'HSwish', 2], [5, 960, 160, True, 'HSwish', 1],
        [5, 960, 160, True, 'HSwish', 1]],
}


@BACKBONES.register_module()
class MobileNetV3(nn.Module):
    """MobileNetV3 small/large for segmentation (LRASPP pairing)."""
    arch: str = 'small'
    out_indices: Sequence[int] = (0, 1, 12)
    frozen_stages: int = -1
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    reduction_factor: int = 1
    norm_eval: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``mobilenet_v3.py:56-70`` constructor contract
        assert self.arch in _ARCH, \
            f"arch must be one of {sorted(_ARCH)}, got {self.arch!r}"
        assert isinstance(self.reduction_factor, int) and \
            self.reduction_factor > 0, \
            f'reduction_factor must be a positive int, ' \
            f'got {self.reduction_factor!r}'
        # layer0 stem + arch blocks + the final pointwise conv layer
        n_layers = len(_ARCH[self.arch]) + 2
        for index in self.out_indices:
            if index not in range(n_layers):
                raise ValueError(
                    f'the item in out_indices must in range(0, {n_layers}), '
                    f'but received {index}')
        if self.frozen_stages not in range(-1, n_layers):
            raise ValueError(
                f'frozen_stages must be in range(-1, {n_layers}), '
                f'but received {self.frozen_stages}')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        layers = _ARCH[self.arch]
        # segmentation surgery (reference mobilenet_v3.py:199-241): from
        # layer `surgery_start` on, strided depthwise convs drop to stride 1
        # and dilation grows (2, then 4 from `dil4_start`), keeping the
        # backbone at output stride 16
        surgery_start, dil4_start, stride1_at = \
            (4, 9, (4, 9)) if self.arch == 'small' else (7, 13, (7, 13))
        in_ch = 16
        # stem uses Conv2dAdaptivePadding (TF 'SAME': bottom/right pad)
        x = ConvModule(in_ch, 3, stride=2, padding='SAME',
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name='layer0')(x, train=train)
        outs = []
        if 0 in self.out_indices:
            outs.append(x)
        for i, (k, mid, out_ch, with_se, act, stride) in enumerate(layers):
            if (self.arch == 'large' and i >= 12) or (
                    self.arch == 'small' and i >= 8):
                mid = mid // self.reduction_factor
                out_ch = out_ch // self.reduction_factor
            p = i + 1  # position in the reference's layers list
            dilation = 1
            dw_stride = None
            if p >= surgery_start:
                dilation = 2 if p < dil4_start else 4
                if p in stride1_at:
                    dw_stride = 1
            x = InvertedResidualV3(
                out_channels=out_ch, mid_channels=mid, kernel_size=k,
                stride=stride, se_ratio=0.25 if with_se else None,
                with_expand_conv=(mid != x.shape[-1]),
                act_cfg=dict(type=act), norm_cfg=norm_cfg,
                dilation=dilation, dw_stride=dw_stride,
                name=f'layer{i + 1}')(x, train=train)
            if (i + 1) in self.out_indices:
                outs.append(x)
        # final pointwise conv layer — reference mobilenet_v3.py:185-194
        # keeps its width at 576/960 regardless of reduction_factor (the
        # surgery's dilation=4 is inert on a 1x1 conv)
        final_ch = 576 if self.arch == 'small' else 960
        x = ConvModule(final_ch, 1,
                       norm_cfg=norm_cfg, act_cfg=dict(type='HSwish'),
                       name=f'layer{len(layers) + 1}')(x, train=train)
        if (len(layers) + 1) in self.out_indices:
            outs.append(x)
        return outs
