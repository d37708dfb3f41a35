"""MaxViT core blocks (flax NHWC) — shared by the MaxViT encoder backbone
(≙ reference ``backbones/maxvit_encoder.py:39,244,337,432``) and the
MaxViTDecoder head.

Faithful quirks kept from the reference implementation: attention scale is
``num_heads ** -0.5`` (not head_dim — reference ``maxvit_encoder.py:271``);
MBConv = norm → 1x1 conv → depthwise-separable(stride) → SE → 1x1 proj with
a maxpool+1x1 skip when downscaling.

TPU notes: block and grid partitions are reshapes/transposes only; both
attention variants run as one batched matmul over (B·windows, heads, N, N)
with N = grid_window² (64 for the author's (8, 8) config) — small-N batched
MXU work.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.ops.window_attention import (fused_attention_enabled,
                                               window_attention)
from ..bricks import BatchNorm, Conv2d, max_pool2d
from .swin_core import DropPath, relative_position_index


def window_partition_nhwc(x, window_size: Tuple[int, int]):
    """(B, H, W, C) → (B*windows, wh, ww, C) — contiguous windows."""
    b, h, w, c = x.shape
    wh, ww = window_size
    x = x.reshape(b, h // wh, wh, w // ww, ww, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh, ww, c)


def window_reverse_nhwc(windows, original_size: Tuple[int, int],
                        window_size: Tuple[int, int]):
    h, w = original_size
    wh, ww = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // wh // ww)
    x = windows.reshape(b, h // wh, w // ww, wh, ww, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def grid_partition_nhwc(x, grid_size: Tuple[int, int]):
    """(B, H, W, C) → (B*grids, gh, gw, C) — dilated (strided) windows."""
    b, h, w, c = x.shape
    gh, gw = grid_size
    x = x.reshape(b, gh, h // gh, gw, w // gw, c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, gh, gw, c)


def grid_reverse_nhwc(grid, original_size: Tuple[int, int],
                      grid_size: Tuple[int, int]):
    h, w = original_size
    gh, gw = grid_size
    c = grid.shape[-1]
    b = grid.shape[0] // (h * w // gh // gw)
    x = grid.reshape(b, h // gh, w // gw, gh, gw, c)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, c)


class SqueezeExcite(nn.Module):
    """timm-style SE: pool → reduce conv → relu → expand conv → sigmoid."""
    rd_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = max(1, int(c * self.rd_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv2d(rd, 1, name='conv_reduce')(s)
        s = nn.relu(s)
        s = Conv2d(c, 1, name='conv_expand')(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    """MBConv (reference ``maxvit_encoder.py:39``)."""
    out_channels: int
    downscale: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = BatchNorm(name='pre_norm')(x, train=train)
        y = Conv2d(in_ch, 1, name='conv_pw_exp')(y)
        # depthwise-separable conv (timm DepthwiseSeparableConv)
        y = Conv2d(in_ch, 3, stride=2 if self.downscale else 1, padding=1,
                   groups=in_ch, use_bias=False, name='conv_dw')(y)
        y = BatchNorm(name='bn_dw')(y, train=train)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(self.out_channels, 1, use_bias=False, name='conv_pw')(y)
        y = BatchNorm(name='bn_pw')(y, train=train)
        y = SqueezeExcite(name='se')(y)
        y = Conv2d(self.out_channels, 1, name='conv_proj')(y)
        y = DropPath(self.drop_path, name='drop_path')(y, train=train)
        if self.downscale:
            skip = max_pool2d(x, 2, 2)
            skip = Conv2d(self.out_channels, 1, name='skip_conv')(skip)
        elif in_ch != self.out_channels:
            # decoder variant: 1x1 channel-matching skip
            # (reference ``maxvit_decoder.py:74-75``)
            skip = Conv2d(self.out_channels, 1, name='skip_conv')(x)
        else:
            skip = x
        return y + skip


class RelativeSelfAttention(nn.Module):
    """Relative self-attention (reference ``maxvit_encoder.py:244``).

    On a single TPU device the score/softmax/apply chain runs as the fused
    Pallas kernel (``ops/window_attention.py``): with num_heads=32 the head
    dim is 2..16, the per-head einsums are HBM-bound on their (B_, H, N, N)
    score tensors, and the fused kernel keeps those in VMEM (measured ~2.2x
    on the fwd+bwd stage-0/1 geometries, with in-kernel attention dropout
    ~free vs the ~2x mask-generation cost of the XLA path —
    ``docs/data/fused_attn_probe.json``)."""
    in_channels: int
    num_heads: int = 32
    grid_window_size: Tuple[int, int] = (7, 7)
    attn_drop: float = 0.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b_, n, c = x.shape
        heads = self.num_heads
        scale = heads ** -0.5  # reference quirk: heads, not head_dim
        qkv = nn.Dense(3 * c, dtype=x.dtype, name='qkv_mapping')(x)
        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * self.grid_window_size[0] - 1) *
             (2 * self.grid_window_size[1] - 1), heads), jnp.float32)
        rel_index = relative_position_index(self.grid_window_size)
        bias = bias_table[rel_index.reshape(-1)].reshape(
            n, n, heads).transpose(2, 0, 1)
        rate = float(self.attn_drop) if train else 0.0
        if fused_attention_enabled() and c % heads == 0:
            # the Dense output's (..., 3, heads, d) layout means plain lane
            # slices of thirds are already head-major packed (W, N, C)
            q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
            bias_e = bias.transpose(1, 0, 2).reshape(n, heads * n)
            if rate > 0.0:
                key = self.make_rng('dropout')
                if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
                    key = jax.random.key_data(key)
                seed = jax.lax.bitcast_convert_type(
                    key.reshape(-1)[:1], jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            out = window_attention(q, k, v, bias_e, seed, heads, scale,
                                   rate)
        else:
            qkv = qkv.reshape(b_, n, 3, heads, -1).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum('bhnd,bhmd->bhnm', q * scale, k)
            attn = jax.nn.softmax(attn + bias[None].astype(attn.dtype),
                                  axis=-1)
            attn = nn.Dropout(self.attn_drop,
                              deterministic=not train)(attn)
            out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
            out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(c, dtype=x.dtype, name='proj')(out)
        return nn.Dropout(self.drop, deterministic=not train)(out)


class _Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden, dtype=x.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out, dtype=x.dtype, name='fc2')(x)
        return nn.Dropout(self.drop, deterministic=not train)(x)


class MaxViTTransformerBlock(nn.Module):
    """Partition → LN → RelAttn → reverse, with MLP
    (reference ``maxvit_encoder.py:337``)."""
    in_channels: int
    partition: str  # 'window' | 'grid'
    num_heads: int = 32
    grid_window_size: Tuple[int, int] = (7, 7)
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        gws = self.grid_window_size
        if self.partition == 'window':
            part, rev = window_partition_nhwc, window_reverse_nhwc
        else:
            part, rev = grid_partition_nhwc, grid_reverse_nhwc
        p = part(x, gws).reshape(-1, gws[0] * gws[1], c)
        a = nn.LayerNorm(epsilon=1e-5, name='norm_1', dtype=p.dtype)(p)
        a = RelativeSelfAttention(
            c, self.num_heads, gws, self.attn_drop, self.drop,
            name='attention')(a, train=train)
        p = p + DropPath(self.drop_path, name='dp1')(a, train=train)
        m = nn.LayerNorm(epsilon=1e-5, name='norm_2', dtype=p.dtype)(p)
        m = _Mlp(int(self.mlp_ratio * c), c, self.drop,
                 name='mlp')(m, train=train)
        p = p + DropPath(self.drop_path, name='dp2')(m, train=train)
        return rev(p.reshape(-1, gws[0], gws[1], c), (h, w), gws)


def apply_maxvit_block(block: 'MaxViTBlock', x, train: bool, with_cp):
    """Apply a MaxViTBlock, rematerialising during backward per ``with_cp``
    (≙ torch ``checkpoint``; the reference applies it per stage at
    ``maxvit_encoder.py:621`` — per-block is strictly finer-grained).

    Modes (Parameter/RNG paths are identical in all of them, so checkpoints
    trained under any mode are interchangeable):

    - ``False``: no remat.
    - ``True`` / ``'block'``: ``nn.remat`` over the whole block — saves only
      the block-boundary activation, recomputes MBConv + both attention
      transformers in backward. Lowest memory, highest recompute.
    - ``'dots'``: whole-block remat with the
      ``dots_with_no_batch_dims_saveable`` policy — matmul outputs (qkv /
      attn / proj / MLP dense results) are saved from the forward; only the
      elementwise/reshape glue is recomputed. Much cheaper backward than
      'block' while still dropping the conv/BN/partition temporaries.
    - ``'attn'``: remat only the two attention transformer sub-blocks;
      MBConv activations are saved as in plain mode.

    At B=8 512² plain mode is a 28 GB program (v5e has 15.75 GB), so some
    remat tier is mandatory; the round-4 probe (`tools/probe_maxvit_train.py`,
    ``docs/data/maxvit_train_probe.json``) measures which tier wins.
    """
    mode = 'block' if with_cp is True else with_cp
    if not mode or not train:
        return block(x, train=train)
    if mode == 'attn':
        return block(x, train=train, remat_attn=True)
    policy = None
    if mode == 'dots':
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return nn.remat(lambda mdl, y: mdl(y, train=True),
                    policy=policy)(block, x)


class MaxViTBlock(nn.Module):
    """MBConv + window attention + grid attention
    (reference ``maxvit_encoder.py:432``)."""
    out_channels: int
    downscale: bool = False
    num_heads: int = 32
    grid_window_size: Tuple[int, int] = (7, 7)
    attn_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False, remat_attn: bool = False):
        x = MBConv(self.out_channels, self.downscale, self.drop_path,
                   name='mb_conv')(x, train=train)
        window = MaxViTTransformerBlock(
            self.out_channels, 'window', self.num_heads,
            self.grid_window_size, self.attn_drop, self.drop,
            self.drop_path, self.mlp_ratio, name='block_transformer')
        grid = MaxViTTransformerBlock(
            self.out_channels, 'grid', self.num_heads,
            self.grid_window_size, self.attn_drop, self.drop,
            self.drop_path, self.mlp_ratio, name='grid_transformer')
        if remat_attn and train:
            # with_cp='attn': recompute only the attention sub-blocks in
            # backward; MBConv residuals stay saved (see apply_maxvit_block)
            apply = nn.remat(lambda mdl, y: mdl(y, train=True))
            return apply(grid, apply(window, x))
        return grid(window(x, train=train), train=train)
