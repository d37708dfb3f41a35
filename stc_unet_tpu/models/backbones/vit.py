"""VisionTransformer backbone (≙ reference ``backbones/vit.py``, 440 LoC).

Standard ViT: conv patch embed, cls token + interpolatable pos embed,
pre-LN blocks; multi-level outputs reshaped to NHWC maps for seg heads.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..builder import BACKBONES
from ..utils.swin_core import DropPath


class _VitMHA(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=x.dtype,
                       name='qkv')(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k) * hd ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=x.dtype, name='proj')(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class _VitBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    ln_eps: float = 1e-6  # stock ViT configs: norm_cfg LN eps=1e-6

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = nn.LayerNorm(epsilon=self.ln_eps, name='norm1', dtype=x.dtype)(x)
        a = _VitMHA(self.dim, self.num_heads, self.qkv_bias,
                    self.attn_drop, self.drop, name='attn')(a, train=train)
        x = x + DropPath(self.drop_path, name='dp1')(a, train=train)
        m = nn.LayerNorm(epsilon=self.ln_eps, name='norm2',
                         dtype=x.dtype)(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio), dtype=x.dtype,
                     name='fc1')(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dropout(self.drop, deterministic=not train)(m)
        m = nn.Dense(self.dim, dtype=x.dtype, name='fc2')(m)
        m = nn.Dropout(self.drop, deterministic=not train)(m)
        return x + DropPath(self.drop_path, name='dp2')(m, train=train)


@BACKBONES.register_module()
class VisionTransformer(nn.Module):
    """ViT backbone with seg-friendly multi-level outputs."""
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (9, 14, 19, 23)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    with_cls_token: bool = True
    output_cls_token: bool = False
    final_norm: bool = False
    interpolate_mode: str = 'bicubic'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    patch_norm: bool = False
    patch_pad: str = 'corner'
    pre_norm: bool = False
    norm_eval: bool = False
    num_fcs: int = 2
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``vit.py:141-160`` constructor contract (shared with
        # BEiT/MAE which copy it verbatim)
        from ..utils import (check_img_size_out_indices,
                             check_pretrained_init_cfg)
        check_img_size_out_indices(self.img_size, self.out_indices)
        check_pretrained_init_cfg(self.pretrained, self.init_cfg)
        assert self.with_cls_token or not self.output_cls_token, \
            'with_cls_token must be True when output_cls_token is True'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        ps = self.patch_size
        img_size = self.img_size
        if isinstance(img_size, (tuple, list)):
            img_size = img_size[0]
        pad_h = (ps - x.shape[1] % ps) % ps
        pad_w = (ps - x.shape[2] % ps) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps),
                    padding='VALID', dtype=x.dtype, name='patch_embed')(x)
        _, h, w, _ = x.shape
        tokens = x.reshape(b, h * w, self.embed_dims)
        pos_len = (img_size // ps) ** 2 + 1
        pos_embed = self.param('pos_embed',
                               nn.initializers.truncated_normal(0.02),
                               (1, pos_len, self.embed_dims), jnp.float32)
        cls_token = self.param('cls_token',
                               nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dims), jnp.float32)
        # interpolate the grid part of pos_embed to (h, w)
        side = img_size // ps
        grid = pos_embed[:, 1:].reshape(1, side, side, self.embed_dims)
        if (h, w) != (side, side):
            from stc_unet_tpu.ops import resize
            # reference vit.py resize_pos_embed honors interpolate_mode
            # (default 'bicubic')
            grid = resize(grid, size=(h, w), mode=self.interpolate_mode,
                          align_corners=False, warning=False)
        pos = jnp.concatenate(
            [pos_embed[:, :1],
             grid.reshape(1, h * w, self.embed_dims)], axis=1)
        cls = jnp.broadcast_to(cls_token, (b, 1, self.embed_dims))
        tokens = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)
        tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.drop_rate, deterministic=not train)(tokens)
        if not self.with_cls_token:
            tokens = tokens[:, 1:]
        dpr = list(np.linspace(0, self.drop_path_rate, self.num_layers))
        eps = float((self.norm_cfg or {}).get('eps', 1e-6))
        out_indices = [i if i >= 0 else self.num_layers + i
                       for i in self.out_indices]
        outs = []
        for i in range(self.num_layers):
            tokens = _VitBlock(
                self.embed_dims, self.num_heads, self.mlp_ratio,
                self.qkv_bias, self.drop_rate, self.attn_drop_rate, dpr[i],
                ln_eps=eps,
                name=f'layers_{i}')(tokens, train=train)
            if i == self.num_layers - 1 and self.final_norm:
                tokens = nn.LayerNorm(epsilon=eps, name='norm1_final',
                                      dtype=tokens.dtype)(tokens)
            if i in out_indices:
                t = tokens[:, 1:] if self.with_cls_token else tokens
                feat = t.reshape(b, h, w, self.embed_dims)
                if self.with_cls_token and self.output_cls_token:
                    # reference vit.py: [patch_tokens, cls_token] per level —
                    # the DPTHead readout contract
                    outs.append((feat, tokens[:, 0]))
                else:
                    outs.append(feat)
        return outs
