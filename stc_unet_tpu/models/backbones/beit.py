"""BEiT and MAE backbones (≙ reference ``backbones/beit.py`` (559),
``backbones/mae.py`` (261)): ViT variants with per-block relative position
bias (BEiT) and LayerScale gammas, no absolute pos-embed interpolation
headaches (BEiT has no cls-token pos embedding).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..builder import BACKBONES
from ..utils.swin_core import DropPath


def beit_relative_position_index(wh: int, ww: int) -> np.ndarray:
    """BEiT rel-pos index with extra cls-token rows/cols."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    num = wh * ww
    index = np.zeros((num + 1, num + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = (2 * wh - 1) * (2 * ww - 1)
    index[0:, 0] = (2 * wh - 1) * (2 * ww - 1) + 1
    index[0, 0] = (2 * wh - 1) * (2 * ww - 1) + 2
    return index


class BEiTAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    qv_bias: bool = True
    full_qkv_bias: bool = False  # MAE: plain qkv bias (mae.py:145 bias=True)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        hd = c // self.num_heads
        # qkv with q/v bias only (BEiT quirk: k has no bias)
        qkv_w = nn.Dense(3 * c, use_bias=self.full_qkv_bias, dtype=x.dtype,
                         name='qkv')(x)
        if self.qv_bias and not self.full_qkv_bias:
            q_bias = self.param('q_bias', nn.initializers.zeros, (c,),
                                jnp.float32)
            v_bias = self.param('v_bias', nn.initializers.zeros, (c,),
                                jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias),
                                    v_bias]).astype(x.dtype)
            qkv_w = qkv_w + bias
        qkv = qkv_w.reshape(b, n, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * hd ** -0.5
        wh, ww = self.window_size
        table_size = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param('relative_position_bias_table',
                           nn.initializers.zeros,
                           (table_size, self.num_heads), jnp.float32)
        index = beit_relative_position_index(wh, ww)
        if n == index.shape[0]:
            bias_map = table[index.reshape(-1)].reshape(
                n, n, self.num_heads).transpose(2, 0, 1)
            attn = attn + bias_map[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=x.dtype, name='proj')(out)


class BEiTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    mlp_ratio: float
    drop_path: float
    init_values: float = 0.1
    qv_bias: bool = True
    full_qkv_bias: bool = False
    ln_eps: float = 1e-6  # stock BEiT/MAE configs: LN eps=1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        g1 = self.param('gamma_1', nn.initializers.constant(
            self.init_values), (self.dim,), jnp.float32)
        g2 = self.param('gamma_2', nn.initializers.constant(
            self.init_values), (self.dim,), jnp.float32)
        a = nn.LayerNorm(epsilon=self.ln_eps, name='norm1', dtype=x.dtype)(x)
        a = BEiTAttention(self.dim, self.num_heads, self.window_size,
                          self.qv_bias, self.full_qkv_bias,
                          name='attn')(a, train=train)
        x = x + DropPath(self.drop_path, name='dp1')(
            g1.astype(x.dtype) * a, train=train)
        m = nn.LayerNorm(epsilon=self.ln_eps, name='norm2', dtype=x.dtype)(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype,
                     name='fc1')(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.dim, dtype=x.dtype, name='fc2')(m)
        return x + DropPath(self.drop_path, name='dp2')(
            g2.astype(x.dtype) * m, train=train)


@BACKBONES.register_module()
class BEiT(nn.Module):
    """BEiT backbone."""
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (3, 5, 7, 11)
    qv_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.1
    final_norm: bool = False
    num_fcs: int = 2
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    patch_norm: bool = False
    norm_eval: bool = False
    frozen_stages: int = -1
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    # MAE overrides (reference mae.py: abs pos-embed + full qkv bias)
    _abs_pos_embed: bool = False
    _full_qkv_bias: bool = False

    def __post_init__(self):
        from ..utils import (check_img_size_out_indices,
                             check_pretrained_init_cfg)
        check_pretrained_init_cfg(self.pretrained, self.init_cfg)
        check_img_size_out_indices(self.img_size, self.out_indices)
        super().__post_init__()


    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        ps = self.patch_size
        eps = float((self.norm_cfg or {}).get('eps', 1e-6))
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps),
                    padding='VALID', dtype=x.dtype, name='patch_embed')(x)
        _, h, w, _ = x.shape
        tokens = x.reshape(b, h * w, self.embed_dims)
        cls_token = self.param('cls_token',
                               nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dims), jnp.float32)
        cls = jnp.broadcast_to(cls_token, (b, 1, self.embed_dims))
        tokens = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)
        if self._abs_pos_embed:
            # MAE: learned absolute pos-embed over (cls + grid), grid part
            # bicubic-resized on geometry mismatch (mae.py:210-236)
            img_size = self.img_size
            if isinstance(img_size, (tuple, list)):
                img_size = img_size[0]
            side = img_size // ps
            pos_embed = self.param('pos_embed', nn.initializers.zeros,
                                   (1, side * side + 1, self.embed_dims),
                                   jnp.float32)
            grid = pos_embed[:, 1:].reshape(1, side, side, self.embed_dims)
            if (h, w) != (side, side):
                from stc_unet_tpu.ops import resize
                grid = resize(grid, size=(h, w), mode='bicubic',
                              align_corners=False, warning=False)
            pos = jnp.concatenate(
                [pos_embed[:, :1],
                 grid.reshape(1, h * w, self.embed_dims)], axis=1)
            tokens = tokens + pos.astype(tokens.dtype)
        dpr = list(np.linspace(0, self.drop_path_rate, self.num_layers))
        raw_indices = ([self.out_indices] if isinstance(self.out_indices, int)
                       else self.out_indices)  # ref normalizes int → [i]
        out_indices = [i if i >= 0 else self.num_layers + i
                       for i in raw_indices]
        outs = []
        for i in range(self.num_layers):
            tokens = BEiTBlock(self.embed_dims, self.num_heads, (h, w),
                               self.mlp_ratio, dpr[i], self.init_values,
                               self.qv_bias, self._full_qkv_bias, eps,
                               name=f'layers_{i}')(tokens, train=train)
            if i == self.num_layers - 1 and self.final_norm:
                tokens = nn.LayerNorm(epsilon=eps, name='norm1_final',
                                      dtype=tokens.dtype)(tokens)
            if i in out_indices:
                outs.append(tokens[:, 1:].reshape(b, h, w,
                                                  self.embed_dims))
        return outs


@BACKBONES.register_module()
class MAE(BEiT):
    """MAE backbone (reference ``mae.py``): BEiT blocks with rel-pos bias
    tables (zero-init) PLUS a learned absolute pos-embed added after the
    cls concat, and a plain full qkv bias (mae.py:145 ``bias=True``)."""
    out_indices: Sequence[int] = (3, 5, 7, 11)
    init_values: float = 0.1
    _abs_pos_embed: bool = True
    _full_qkv_bias: bool = True
