"""FPN neck (≙ reference ``necks/fpn.py``)."""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import ConvModule, max_pool2d
from ..builder import NECKS


@NECKS.register_module()
class FPN(nn.Module):
    """Feature Pyramid Network."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    extra_convs_on_inputs: bool = False
    relu_before_extra_convs: bool = False
    no_norm_on_lateral: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end_level = len(inputs) if self.end_level == -1 else self.end_level
        used = list(range(self.start_level, end_level))
        up_cfg = dict(self.upsample_cfg or dict(mode='nearest'))

        laterals = [
            ConvModule(self.out_channels, 1,
                       norm_cfg=None if self.no_norm_on_lateral
                       else self.norm_cfg,
                       act_cfg=self.act_cfg,
                       name=f'lateral_convs_{i}')(inputs[idx], train=train)
            for i, idx in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], size=laterals[i - 1].shape[1:3],
                mode=up_cfg.get('mode', 'nearest'),
                align_corners=up_cfg.get('align_corners', None),
                warning=False)
        outs = [
            ConvModule(self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       name=f'fpn_convs_{i}')(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        if self.num_outs > len(outs):
            if not self.add_extra_convs:
                for _ in range(self.num_outs - len(outs)):
                    outs.append(max_pool2d(outs[-1], 1, stride=2))
            else:
                # reference fpn.py:106-115,199-204: bool True resolves via
                # extra_convs_on_inputs; str picks the first extra conv's
                # source explicitly
                mode = self.add_extra_convs
                if mode is True:
                    mode = 'on_input' if self.extra_convs_on_inputs \
                        else 'on_output'
                if mode == 'on_input':
                    src = inputs[end_level - 1]
                elif mode == 'on_lateral':
                    src = laterals[-1]
                elif mode == 'on_output':
                    src = outs[-1]
                else:
                    raise NotImplementedError(
                        f'invalid add_extra_convs {self.add_extra_convs!r}')
                for i in range(self.num_outs - len(outs)):
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = ConvModule(
                        self.out_channels, 3, stride=2, padding=1,
                        norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                        name=f'extra_convs_{i}')(src, train=train)
                    outs.append(src)
        return outs
