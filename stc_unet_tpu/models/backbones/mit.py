"""MixVisionTransformer / MiT — the SegFormer backbone
(≙ reference ``backbones/mit.py``, 450 LoC).

Overlapping patch embeds, efficient self-attention with spatial-reduction
(sr_ratio) on K/V, and Mix-FFN (3x3 depthwise conv between the linears).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..bricks import Conv2d
from ..builder import BACKBONES
from ..utils.swin_core import DropPath


class EfficientMHA(nn.Module):
    """MHA with conv spatial reduction of keys/values (sr_ratio)."""
    dim: int
    num_heads: int
    sr_ratio: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6  # MiT default (reference mit.py:356); Twins: 1e-5

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, c = x.shape
        h, w = hw
        head_dim = c // self.num_heads
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=x.dtype,
                     name='q')(x)
        kv_in = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = Conv2d(c, self.sr_ratio, self.sr_ratio, name='sr')(xr)
            kv_in = xr.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, name='sr_norm',
                                 dtype=x.dtype)(kv_in)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=x.dtype,
                      name='kv')(kv_in)
        m = kv_in.shape[1]
        k, v = kv[..., :c], kv[..., c:]
        q = q.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * head_dim ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=x.dtype, name='proj')(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class MixFFN(nn.Module):
    """FFN with a 3x3 depthwise conv between the linears."""
    dim: int
    hidden: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, c = x.shape
        h, w = hw
        x = nn.Dense(self.hidden, dtype=x.dtype, name='fc1')(x)
        xr = x.reshape(b, h, w, self.hidden)
        xr = Conv2d(self.hidden, 3, padding=1, groups=self.hidden,
                    name='dwconv')(xr)
        x = xr.reshape(b, n, self.hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=x.dtype, name='fc2')(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float
    drop: float
    attn_drop: float
    drop_path: float
    qkv_bias: bool
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        a = nn.LayerNorm(epsilon=self.ln_eps, name='norm1', dtype=x.dtype)(x)
        a = EfficientMHA(self.dim, self.num_heads, self.sr_ratio,
                         self.attn_drop, self.drop, self.qkv_bias,
                         ln_eps=self.ln_eps,
                         name='attn')(a, hw, train=train)
        x = x + DropPath(self.drop_path, name='dp1')(a, train=train)
        m = nn.LayerNorm(epsilon=self.ln_eps, name='norm2', dtype=x.dtype)(x)
        m = MixFFN(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                   name='ffn')(m, hw, train=train)
        return x + DropPath(self.drop_path, name='dp2')(m, train=train)


@BACKBONES.register_module()
class MixVisionTransformer(nn.Module):
    """MiT-B0..B5 backbone (config vocabulary matches mmseg's)."""
    in_channels: int = 3
    embed_dims: int = 64
    num_stages: int = 4
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    act_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        from ..utils import check_pretrained_init_cfg
        check_pretrained_init_cfg(self.pretrained, self.init_cfg)
        super().__post_init__()


    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = float((self.norm_cfg or {}).get('eps', 1e-6))
        dpr = list(np.linspace(0, self.drop_path_rate,
                               sum(self.num_layers)))
        outs = []
        cur = 0
        for i in range(self.num_stages):
            dim = self.embed_dims * self.num_heads[i]
            k, s = self.patch_sizes[i], self.strides[i]
            x = Conv2d(dim, k, s, padding=k // 2,
                       name=f'patch_embed{i}_proj')(x)
            b, h, w, _ = x.shape
            tokens = x.reshape(b, h * w, dim)
            tokens = nn.LayerNorm(epsilon=eps,
                                  name=f'patch_embed{i}_norm',
                                  dtype=x.dtype)(tokens)
            for j in range(self.num_layers[i]):
                tokens = MiTBlock(
                    dim, self.num_heads[i], self.sr_ratios[i],
                    self.mlp_ratio, self.drop_rate, self.attn_drop_rate,
                    dpr[cur + j], self.qkv_bias, ln_eps=eps,
                    name=f'block{i}_{j}')(tokens, (h, w), train=train)
            cur += self.num_layers[i]
            tokens = nn.LayerNorm(epsilon=eps, name=f'norm{i}',
                                  dtype=x.dtype)(tokens)
            x = tokens.reshape(b, h, w, dim)
            if i in self.out_indices:
                outs.append(x)
        return outs
