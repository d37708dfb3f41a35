"""Swin transformer core blocks (flax), shared by SwinUNet
(≙ reference ``decode_heads/swinunet_head.py:92,190``) and the Swin backbone.

TPU notes: window partition/reverse are pure reshapes/transposes (no
gather); the shifted-window attention mask is computed with numpy at trace
time from static shapes and baked into the program as a constant; attention
runs as batched einsum over (numWindows*B, heads, N, N) — MXU-friendly
because N = window² (256 for the 16x16 windows the author's config uses).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth on the batch axis (timm semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    if rng is None:
        raise ValueError('drop_path needs an rng in train mode')
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng('dropout')
        return drop_path(x, self.rate, deterministic=False, rng=rng)


def window_partition(x, window_size: int):
    """(B, H, W, C) → (num_windows*B, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size,
                  window_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                 window_size, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """(num_windows*B, ws, ws, C) → (B, H, W, C)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size,
                        window_size, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """Standard swin relative-position index table (static numpy)."""
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing='ij'))  # 2, Wh, Ww
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (Wh*Ww, Wh*Ww)


def shifted_window_mask(h: int, w: int, window_size: int,
                        shift_size: int) -> Optional[np.ndarray]:
    """Attention mask for SW-MSA (static numpy, reference
    ``swinunet_head.py:232-252``)."""
    if shift_size == 0:
        return None
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift_size),
               slice(-shift_size, None)):
        for ws in (slice(0, -window_size), slice(-window_size, -shift_size),
                   slice(-shift_size, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mask_windows = np.reshape(
        img_mask.reshape(1, h // window_size, window_size,
                         w // window_size, window_size, 1)
        .transpose(0, 1, 3, 2, 4, 5), (-1, window_size * window_size))
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference ``swinunet_head.py:92``)."""
    dim: int
    window_size: Tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5
        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1),
             self.num_heads), jnp.float32)
        rel_index = relative_position_index(self.window_size)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=x.dtype, name='qkv')(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k)
        bias = bias_table[rel_index.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        x = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        x = x.transpose(0, 2, 1, 3).reshape(b_, n, c)
        x = nn.Dense(self.dim, dtype=x.dtype, name='proj')(x)
        return nn.Dropout(self.proj_drop, deterministic=not train)(x)


class SwinMlp(nn.Module):
    hidden_dim: int
    out_dim: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=x.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out_dim, dtype=x.dtype, name='fc2')(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class SwinTransformerBlock(nn.Module):
    """Swin block: (S)W-MSA + MLP with pre-LN and drop-path
    (reference ``swinunet_head.py:190``).

    ``pad_to_window=False`` (SwinUNet semantics, original Microsoft code):
    if the feature map is not larger than the window, shrink the window to
    the map and drop the shift. ``pad_to_window=True`` (mmseg backbone
    semantics, reference ``swin.py:180-252``): NEVER shrink — zero-pad the
    norm1 output bottom/right to a window multiple inside every block,
    attend (mask computed over the padded canvas), crop back. The two
    differ numerically whenever (h, w) is not a window multiple.
    """
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    pad_to_window: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        window_size, shift_size = self.window_size, self.shift_size
        if not self.pad_to_window and min(h, w) <= window_size:
            # window larger than input → plain attention (reference guard)
            shift_size = 0
            window_size = min(h, w)
        b, l, c = x.shape
        assert l == h * w, 'input feature has wrong size'

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name='norm1', dtype=x.dtype)(x)
        x = x.reshape(b, h, w, c)
        pad_b = pad_r = 0
        if self.pad_to_window:
            pad_b = (window_size - h % window_size) % window_size
            pad_r = (window_size - w % window_size) % window_size
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift_size > 0:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
        mask = shifted_window_mask(hp, wp, window_size, shift_size)
        x_windows = window_partition(x, window_size)
        x_windows = x_windows.reshape(-1, window_size * window_size, c)
        attn_windows = WindowAttention(
            self.dim, (window_size, window_size), self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            name='attn')(x_windows, mask=mask, train=train)
        attn_windows = attn_windows.reshape(-1, window_size, window_size, c)
        x = window_reverse(attn_windows, window_size, hp, wp)
        if shift_size > 0:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        x = x.reshape(b, h * w, c)
        x = shortcut + DropPath(self.drop_path, name='drop_path1')(
            x, train=train)

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name='norm2', dtype=x.dtype)(x)
        x = SwinMlp(int(self.dim * self.mlp_ratio), self.dim,
                    drop=self.drop, name='mlp')(x, train=train)
        return shortcut + DropPath(self.drop_path, name='drop_path2')(
            x, train=train)


class PatchMerging(nn.Module):
    """2x2 token merge → 2C (reference ``swinunet_head.py:318``)."""
    input_resolution: Tuple[int, int]
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        b, l, c = x.shape
        assert l == h * w and h % 2 == 0 and w % 2 == 0
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name='norm', dtype=x.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=x.dtype,
                        name='reduction')(x)


class PatchExpand(nn.Module):
    """2x token expansion (reference ``swinunet_head.py:367``)."""
    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        if self.dim_scale == 2:
            x = nn.Dense(2 * self.dim, use_bias=False, dtype=x.dtype,
                         name='expand')(x)
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, 2, 2, c // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2 * w * 2, c // 4)
        return nn.LayerNorm(epsilon=1e-5, name='norm', dtype=x.dtype)(x)


class FinalPatchExpandX4(nn.Module):
    """4x final expansion (reference ``swinunet_head.py:392``)."""
    input_resolution: Tuple[int, int]
    dim: int
    dim_scale: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = self.input_resolution
        s = self.dim_scale
        x = nn.Dense(16 * self.dim, use_bias=False, dtype=x.dtype,
                     name='expand')(x)
        b, l, c = x.shape
        assert l == h * w
        x = x.reshape(b, h, w, s, s, c // (s * s))
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s * w * s,
                                                  self.dim)
        return nn.LayerNorm(epsilon=1e-5, name='norm', dtype=x.dtype)(x)


class PatchEmbed(nn.Module):
    """Conv patchify → tokens (reference ``swinunet_head.py:549``)."""
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding='VALID', dtype=x.dtype, name='proj')(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, name='norm', dtype=x.dtype)(x)
        return x
