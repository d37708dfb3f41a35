"""SwinUNet head (≙ reference ``decode_heads/swinunet_head.py:11,597``).

Full Swin-UNet: patch embed → 4 encoder stages (PatchMerging between) →
symmetric decoder (PatchExpand + skip concat) → 4x final expand → output
conv → ``cls_seg``. Config knobs follow the author's
``my_config/SwinUnet.py``: img_size=512, patch_size=8, window_size=16,
out_channel=64.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..builder import HEADS
from ..utils.swin_core import (FinalPatchExpandX4, PatchEmbed, PatchExpand,
                               PatchMerging, SwinTransformerBlock)
from .decode_head import BaseDecodeHead


class _Stage(nn.Module):
    """Encoder BasicLayer (reference ``swinunet_head.py:420``)."""
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: Sequence[float]
    downsample: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.input_resolution, self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path=self.drop_path[i],
                name=f'blocks_{i}')(x, train=train)
        if self.downsample:
            x = PatchMerging(self.input_resolution, self.dim,
                             name='downsample')(x, train=train)
        return x


class _StageUp(nn.Module):
    """Decoder BasicLayer_up (reference ``swinunet_head.py:490``)."""
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: Sequence[float]
    upsample: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, self.input_resolution, self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop,
                drop_path=self.drop_path[i],
                name=f'blocks_{i}')(x, train=train)
        if self.upsample:
            x = PatchExpand(self.input_resolution, self.dim,
                            name='upsample')(x, train=train)
        return x


class SwinTransformerSys(nn.Module):
    """The symmetric encoder-decoder swin (reference ``:597``)."""
    img_size: int = 512
    patch_size: int = 4
    num_classes: int = 64
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_layers = len(self.depths)
        # resolution from the actual (static) input shape, so the same
        # module serves crops of any square size, not just img_size
        assert x.shape[1] == x.shape[2], 'SwinUNet expects square inputs'
        pr = x.shape[1] // self.patch_size
        x = PatchEmbed(self.patch_size, self.embed_dim,
                       name='patch_embed')(x, train=train)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))

        # encoder
        x_downsample = []
        for i in range(num_layers):
            x_downsample.append(x)
            x = _Stage(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(pr // 2 ** i, pr // 2 ** i),
                depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                downsample=i < num_layers - 1,
                name=f'layers_{i}')(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name='norm', dtype=x.dtype)(x)

        # decoder with skip concat
        for i in range(num_layers):
            dim = int(self.embed_dim * 2 ** (num_layers - 1 - i))
            res = pr // 2 ** (num_layers - 1 - i)
            if i == 0:
                x = PatchExpand((res, res), dim,
                                name='layers_up_0')(x, train=train)
            else:
                x = jnp.concatenate([x, x_downsample[num_layers - 1 - i]],
                                    axis=-1)
                x = nn.Dense(dim, dtype=x.dtype,
                             name=f'concat_back_dim_{i}')(x)
                k = num_layers - 1 - i
                d = self.depths[k]
                # reference swinunet_head.py:705: the decoder reuses the
                # ENCODER's stochastic-depth schedule slice, not zeros
                dp = dpr[sum(self.depths[:k]):sum(self.depths[:k + 1])]
                x = _StageUp(
                    dim=dim, input_resolution=(res, res), depth=d,
                    num_heads=self.num_heads[k],
                    window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate, drop_path=dp,
                    upsample=i < num_layers - 1,
                    name=f'layers_up_{i}')(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name='norm_up', dtype=x.dtype)(x)

        # final 4x expand + output conv (reference up_x4, ``:770-780``)
        x = FinalPatchExpandX4((pr, pr), self.embed_dim,
                               name='up')(x, train=train)
        b = x.shape[0]
        x = x.reshape(b, 4 * pr, 4 * pr, self.embed_dim)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                    dtype=x.dtype, name='output')(x)
        return x


@HEADS.register_module()
class SwinUNet(BaseDecodeHead):
    """SwinUNet monolithic head (reference ``swinunet_head.py:11``)."""
    img_size: int = 512
    patch_size: int = 4
    window_size: int = 8
    out_channel: int = 21843
    zero_head: bool = False
    vis: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        logits = SwinTransformerSys(
            img_size=self.img_size, patch_size=self.patch_size,
            num_classes=self.out_channel, embed_dim=96,
            depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
            window_size=self.window_size, mlp_ratio=4.0, qkv_bias=True,
            drop_rate=0.0, drop_path_rate=0.1,
            name='swin_unet')(x, train=train)
        return self.cls_seg(logits, train=train)
