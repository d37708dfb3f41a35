"""LeViT-UNet-192 head (≙ reference ``decode_heads/levit_head.py:451`` —
dead-on-disk in the reference: decorated but not imported by its
``__init__``; carried for full inventory parity).

Hybrid CNN-stem + 3-stage LeViT transformer encoder (attention with
learned relative-position bias tables, Hardswish, Linear+BN1d
projections, attention-subsample downsamplers) and a conv decoder fusing
the CNN pyramid with all three transformer scales. Defaults are the
LeViT_192 specification (C=192_288_384, D=32, N=3_5_6, X=4_4_4) — the
only configuration the reference's hardcoded block_1/2/3 split is
consistent with. Relative-position index tables are built at trace time
from the actual input resolution (the reference pins them to a ctor
``img_size``)."""
from __future__ import annotations

import itertools
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, h_swish
from ..builder import HEADS
from .decode_head import BaseDecodeHead


class Conv2dBN(nn.Module):
    """bias-free conv + BN (reference ``Conv2d_BN``)."""
    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel, stride=self.stride,
                   padding=self.pad, use_bias=False, name='c')(x)
        return BatchNorm(name='bn')(x, train=train)


class LinearBN(nn.Module):
    """bias-free Linear + BatchNorm1d over tokens (reference
    ``Linear_BN``: BN statistics over the flattened (B*N, C) batch)."""
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=False, dtype=x.dtype,
                     param_dtype=jnp.float32, name='c')(x)
        return BatchNorm(name='bn')(x, train=train)


def _bias_idxs(res, res_=None, stride=1):
    """Relative-offset index table (reference ``Attention.__init__``)."""
    points = list(itertools.product(range(res), range(res)))
    points_ = points if res_ is None else list(
        itertools.product(range(res_), range(res_)))
    offsets, idxs = {}, []
    for p1 in points_:
        for p2 in points:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs).reshape(len(points_), len(points)), len(offsets)


class _LeViTAttention(nn.Module):
    """LeViT attention with relative-position biases (reference
    ``Attention``)."""
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    resolution: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        kd, nh = self.key_dim, self.num_heads
        d = self.attn_ratio * kd
        qkv = LinearBN(nh * (2 * kd + d), name='qkv')(x, train=train)
        qkv = qkv.reshape(b, n, nh, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        idxs, n_off = _bias_idxs(self.resolution)
        biases = self.param('attention_biases', nn.initializers.zeros,
                            (nh, n_off), jnp.float32)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) * kd ** -0.5
        attn = attn + biases[:, idxs].astype(attn.dtype)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * d)
        out = h_swish(out)
        return LinearBN(self.dim, name='proj')(out, train=train)


class _LeViTSubsample(nn.Module):
    """Attention downsampler (reference ``AttentionSubsample``)."""
    out_dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    stride: int
    resolution: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        kd, nh = self.key_dim, self.num_heads
        d = self.attn_ratio * kd
        res = self.resolution
        res_ = (res - 1) // self.stride + 1
        kv = LinearBN(nh * (kd + d), name='kv')(x, train=train)
        kv = kv.reshape(b, n, nh, kd + d)
        k, v = jnp.split(kv, [kd], axis=-1)
        k, v = (t.transpose(0, 2, 1, 3) for t in (k, v))
        xs = x.reshape(b, res, res, c)[:, ::self.stride, ::self.stride]
        q = LinearBN(nh * kd, name='q')(xs.reshape(b, res_ * res_, c),
                                        train=train)
        q = q.reshape(b, res_ * res_, nh, kd).transpose(0, 2, 1, 3)
        idxs, n_off = _bias_idxs(res, res_, self.stride)
        biases = self.param('attention_biases', nn.initializers.zeros,
                            (nh, n_off), jnp.float32)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k) * kd ** -0.5
        attn = attn + biases[:, idxs].astype(attn.dtype)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, res_ * res_, nh * d)
        out = h_swish(out)
        return LinearBN(self.out_dim, name='proj')(out, train=train)


class _MlpBN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = LinearBN(self.hidden, name='fc1')(x, train=train)
        return LinearBN(self.dim, name='fc2')(h_swish(h), train=train)


class _DecoderBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = resize(x, scale_factor=2, mode='bilinear', align_corners=True,
                   warning=False)
        for i in (1, 2):
            x = Conv2d(self.features, 3, padding=1, use_bias=False,
                       name=f'conv{i}_c')(x)
            x = nn.relu(BatchNorm(name=f'conv{i}_bn')(x, train=train))
        return x


@HEADS.register_module()
class LeViT_UNet_192(BaseDecodeHead):
    """LeViT-UNet-192 (reference ``levit_head.py:451``)."""
    embed_dim: Sequence[int] = (192, 288, 384)
    key_dim: int = 32
    depth: Sequence[int] = (4, 4, 4)
    heads: Sequence[int] = (3, 5, 6)
    attn_ratio: Sequence[int] = (2, 2, 2)
    mlp_ratio: Sequence[int] = (2, 2, 2)
    distillation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem width: the reference hardcodes 192 (== embed_dim[0] in the
        # LeViT_192 spec); follow embed_dim[0] so the widths stay coupled
        n = self.embed_dim[0]
        cnn = []
        h = x
        for i, c in enumerate([n // 8, n // 4, n // 2, n]):
            h = Conv2dBN(c, 3, 2, 1, name=f'cnn_b{i + 1}')(h, train=train)
            if i < 3:
                h = h_swish(h)
            cnn.append(h)
        x1, x2, x3, x_cnn = cnn

        b, hh, ww, _ = x_cnn.shape
        res = hh
        t = x_cnn.reshape(b, hh * ww, n)
        stage_maps = []
        block_i = 0
        for s in range(3):
            ed = self.embed_dim[s]
            for _ in range(self.depth[s]):
                t = t + _LeViTAttention(
                    ed, self.key_dim, self.heads[s], self.attn_ratio[s],
                    res, name=f'blocks_{block_i}')(t, train=train)
                block_i += 1
                t = t + _MlpBN(ed, ed * self.mlp_ratio[s],
                               name=f'blocks_{block_i}')(t, train=train)
                block_i += 1
            side = int(t.shape[1] ** 0.5)
            stage_maps.append(t.reshape(b, side, side, t.shape[-1]))
            if s < 2:
                # ('Subsample', D, ed//D, 4, 2, 2)
                t = _LeViTSubsample(
                    self.embed_dim[s + 1], self.key_dim,
                    self.embed_dim[s] // self.key_dim, 4, 2, res,
                    name=f'blocks_{block_i}')(t, train=train)
                block_i += 1
                res = (res - 1) // 2 + 1
                t = t + _MlpBN(self.embed_dim[s + 1],
                               self.embed_dim[s + 1] * 2,
                               name=f'blocks_{block_i}')(t, train=train)
                block_i += 1

        def up2(z):
            return resize(z, scale_factor=2, mode='bilinear',
                          align_corners=True, warning=False)

        r1, r2, r3 = stage_maps
        r2 = up2(r2)
        if r2.shape[1:3] != r1.shape[1:3]:
            r2 = resize(r2, size=r1.shape[1:3], mode='bilinear',
                        align_corners=True, warning=False)
        r3 = up2(up2(r3))
        if r3.shape[1:3] != r2.shape[1:3]:
            r3 = resize(r3, size=r2.shape[1:3], mode='bilinear',
                        align_corners=True, warning=False)
        att_all = jnp.concatenate([r1, r2, r3], axis=-1)

        y = jnp.concatenate([x_cnn, att_all], axis=-1)
        y = _DecoderBlock(512, name='decoderBlock_1')(y, train=train)
        y = _DecoderBlock(256, name='decoderBlock_2')(
            jnp.concatenate([y, x3], axis=-1), train=train)
        y = _DecoderBlock(128, name='decoderBlock_3')(
            jnp.concatenate([y, x2], axis=-1), train=train)
        y = jnp.concatenate([y, x1], axis=-1)
        y = Conv2d(self.num_classes, 3, padding=1,
                   name='segmentation_head')(y)
        return resize(y, scale_factor=2, mode='bilinear',
                      align_corners=True, warning=False)
