"""SwinTransformer backbone (≙ reference ``backbones/swin.py``, 788 LoC).

Reuses the swin core blocks; feature maps are padded to window multiples
before each stage and cropped after (the reference pads inside attention).
Returns NHWC pyramid features at strides 4/8/16/32.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..builder import BACKBONES
from ..utils.swin_core import (PatchEmbed, PatchMerging,
                               SwinTransformerBlock)


class _PaddedStage(nn.Module):
    """Swin blocks (each pads to window INSIDE, per mmseg semantics —
    reference ``swin.py:186-249``), then optional PatchMerging."""
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    drop_rate: float
    attn_drop_rate: float
    drop_path: Sequence[float]
    downsample: bool

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        h, w = hw
        ws = self.window_size
        b, l, c = x.shape
        for i in range(self.depth):
            x = SwinTransformerBlock(
                self.dim, (h, w), self.num_heads, window_size=ws,
                shift_size=0 if i % 2 == 0 else ws // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=self.drop_path[i], pad_to_window=True,
                name=f'blocks_{i}')(x, train=train)
        out = x
        if self.downsample:
            # pad to even before merging
            pe_h, pe_w = h % 2, w % 2
            if pe_h or pe_w:
                x = x.reshape(b, h, w, c)
                x = jnp.pad(x, ((0, 0), (0, pe_h), (0, pe_w), (0, 0)))
                x = x.reshape(b, (h + pe_h) * (w + pe_w), c)
            x = PatchMerging(((h + h % 2), (w + w % 2)), self.dim,
                             name='downsample')(x, train=train)
            return out, x, ((h + 1) // 2, (w + 1) // 2)
        return out, x, (h, w)


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """Swin backbone (config vocabulary matches mmseg's)."""
    pretrain_img_size: int = 224
    in_channels: int = 3
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: float = 4.0
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    strides: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    patch_norm: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    use_abs_pos_embed: bool = False
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    with_cp: bool = False
    pretrained: Optional[str] = None
    frozen_stages: int = -1
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        from ..utils import check_pretrained_init_cfg
        check_pretrained_init_cfg(self.pretrained, self.init_cfg)
        # non-overlapping patch embed: stride of stage 0 must equal the
        # patch size (reference swin.py ctor, test_swin.py:34-37)
        assert self.strides[0] == self.patch_size, \
            'Use non-overlapping patch embed: strides[0] must equal ' \
            f'patch_size, got {self.strides[0]} vs {self.patch_size}'
        if isinstance(self.pretrain_img_size, (tuple, list)):
            # ≙ reference to_2tuple contract (test_swin.py:40-41)
            assert len(self.pretrain_img_size) <= 2, \
                f'pretrain_img_size tuple length must be <= 2, ' \
                f'got {self.pretrain_img_size}'
        elif not isinstance(self.pretrain_img_size, int):
            raise TypeError('pretrain_img_size must be an int or a tuple')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h_img, w_img, _ = x.shape
        # pad image to patch multiple
        ps = self.patch_size
        pad_h = (ps - h_img % ps) % ps
        pad_w = (ps - w_img % ps) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = PatchEmbed(ps, self.embed_dims, use_norm=self.patch_norm,
                       name='patch_embed')(x, train=train)
        hw = ((h_img + pad_h) // ps, (w_img + pad_w) // ps)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        outs = []
        num_layers = len(self.depths)
        for i in range(num_layers):
            dim = int(self.embed_dims * 2 ** i)
            out, x, hw_next = _PaddedStage(
                dim=dim, depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
                attn_drop_rate=self.attn_drop_rate,
                drop_path=dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])],
                downsample=i < num_layers - 1,
                name=f'stages_{i}')(x, hw, train=train)
            if i in self.out_indices:
                # torch LN eps (mmcv build_norm_layer default, swin.py:723)
                normed = nn.LayerNorm(epsilon=1e-5, name=f'norm{i}',
                                      dtype=out.dtype)(out)
                outs.append(normed.reshape(b, hw[0], hw[1], dim))
            hw = hw_next
        return outs
