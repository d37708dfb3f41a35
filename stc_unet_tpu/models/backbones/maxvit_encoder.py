"""MaxViT encoder backbone (≙ reference ``backbones/maxvit_encoder.py:621``).

Conv stem (stride 2) then 4 stages; each stage's first block downscales, so
features come out at strides 4/8/16/32 with the configured channels.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import numpy as np

from ..bricks import Conv2d
from ..builder import BACKBONES
from ..utils.maxvit_core import MaxViTBlock, apply_maxvit_block


class MaxViTStage(nn.Module):
    """Encoder stage (reference ``maxvit_encoder.py:539``)."""
    depth: int
    out_channels: int
    num_heads: int
    grid_window_size: Tuple[int, int]
    attn_drop: float
    drop: float
    drop_path: Sequence[float]
    mlp_ratio: float
    with_cp: Any = False  # False | True/"block" | "attn" | "dots"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            block = MaxViTBlock(
                self.out_channels, downscale=(i == 0),
                num_heads=self.num_heads,
                grid_window_size=self.grid_window_size,
                attn_drop=self.attn_drop, drop=self.drop,
                drop_path=self.drop_path[i], mlp_ratio=self.mlp_ratio,
                name=f'blocks_{i}')
            x = apply_maxvit_block(block, x, train, self.with_cp)
        return x


@BACKBONES.register_module()
class MaxViT(nn.Module):
    """MaxViT backbone (config: ``my_config/MaxViT-UNet.py:5-16``)."""
    in_channels: int = 3
    depths: Sequence[int] = (2, 2, 5, 2)
    channels: Sequence[int] = (64, 128, 256, 512)
    embed_dim: int = 64
    num_heads: int = 32
    grid_window_size: Tuple[int, int] = (7, 7)
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    num_classes: int = 1000  # accepted for config parity; no cls head
    with_cp: Any = False  # per-block remat: True/"block" | "attn" | "dots"
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.embed_dim, 3, 2, padding=1, name='stem_0')(x)
        x = nn.gelu(x, approximate=False)
        x = Conv2d(self.embed_dim, 3, 1, padding=1, name='stem_2')(x)
        x = nn.gelu(x, approximate=False)
        dpr = list(np.linspace(0.0, self.drop_path, sum(self.depths)))
        outs = []
        for i, (depth, ch) in enumerate(zip(self.depths, self.channels)):
            x = MaxViTStage(
                depth=depth, out_channels=ch, num_heads=self.num_heads,
                grid_window_size=tuple(self.grid_window_size),
                attn_drop=self.attn_drop, drop=self.drop,
                drop_path=dpr[sum(self.depths[:i]):
                              sum(self.depths[:i + 1])],
                mlp_ratio=self.mlp_ratio, with_cp=self.with_cp,
                name=f'stages_{i}')(x, train=train)
            outs.append(x)
        return outs
