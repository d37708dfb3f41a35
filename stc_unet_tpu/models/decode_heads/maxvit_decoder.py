"""MaxViTDecoder head (≙ reference ``decode_heads/maxvit_decoder.py:664``).

Mirror of the encoder: per stage a deconv 2x upsample to the skip's width,
skip concat, then MaxViT blocks; final resize to ``output_size`` + cls_seg.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import jax
from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm
from ..builder import HEADS
from ..utils.maxvit_core import MaxViTBlock, apply_maxvit_block
from .decode_head import BaseDecodeHead


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class DeconvModule(nn.Module):
    """ConvTranspose(k=4, s=2, p=1) + BN + Mish
    (reference ``maxvit_decoder.py:517``)."""
    out_channels: int
    kernel_size: int = 4
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel_size, self.scale_factor
        p = (k - s) // 2
        y = nn.ConvTranspose(self.out_channels, (k, k), strides=(s, s),
                             padding='VALID', dtype=x.dtype,
                             name='deconv')(x)
        if p:
            y = y[:, p:y.shape[1] - p, p:y.shape[2] - p, :]
        y = BatchNorm(name='norm')(y, train=train)
        return _mish(y)


class DecoderStage(nn.Module):
    """Upsample + skip concat + MaxViT blocks
    (reference ``maxvit_decoder.py:568``)."""
    depth: int
    skip_channels: int
    out_channels: int
    num_heads: int
    grid_window_size: Tuple[int, int]
    attn_drop: float
    drop: float
    drop_path: Sequence[float]
    mlp_ratio: float
    with_cp: Any = False  # False | True/"block" | "attn" | "dots"

    @nn.compact
    def __call__(self, skip, x, train: bool = False):
        x = DeconvModule(self.skip_channels, name='upsample')(x, train=train)
        x = jnp.concatenate([skip, x], axis=-1)
        for i in range(self.depth):
            block = MaxViTBlock(
                self.out_channels, downscale=False,
                num_heads=self.num_heads,
                grid_window_size=self.grid_window_size,
                attn_drop=self.attn_drop, drop=self.drop,
                drop_path=self.drop_path[i], mlp_ratio=self.mlp_ratio,
                name=f'blocks_{i}')
            x = apply_maxvit_block(block, x, train, self.with_cp)
        return x


@HEADS.register_module()
class MaxViTDecoder(BaseDecodeHead):
    """MaxViT decoder (config ``my_config/MaxViT-UNet.py:17-30``)."""
    # the reference hardcodes these in its super().__init__
    # (``maxvit_decoder.py:706-709``)
    in_index: Any = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    depths: Sequence[int] = (2, 2, 2)
    output_size: Tuple[int, int] = (256, 256)
    num_heads: int = 32
    grid_window_size: Tuple[int, int] = (8, 8)
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0
    with_cp: Any = False  # per-block remat: True/"block" | "attn" | "dots"

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # in_channels e.g. (64, 128, 256, 512); decode from the deepest up
        chans = list(self.in_channels)
        n = len(chans)
        dpr = list(np.linspace(0.0, self.drop_path, sum(self.depths)))
        x = inputs[-1]
        for i, depth in enumerate(self.depths):
            skip = inputs[n - i - 2]
            x = DecoderStage(
                depth=depth,
                skip_channels=chans[n - i - 2],
                out_channels=chans[n - i - 2],
                num_heads=self.num_heads,
                grid_window_size=tuple(self.grid_window_size),
                attn_drop=self.attn_drop, drop=self.drop,
                drop_path=dpr[sum(self.depths[:i]):
                              sum(self.depths[:i + 1])],
                mlp_ratio=self.mlp_ratio, with_cp=self.with_cp,
                name=f'stages_{i}')(skip, x, train=train)
        x = resize(x, size=tuple(self.output_size), mode='bilinear',
                   align_corners=self.align_corners, warning=False)
        return self.cls_seg(x, train=train)
