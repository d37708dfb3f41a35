"""ViT for TransUNet (≙ reference ``decode_heads/vit.py:93``).

Faithful to the reference's quirks: the attention energy is *multiplied* by
sqrt(head_dim) (``vit.py:12,22`` — nonstandard but checkpoint-bearing), the
learned position embedding is a (tokens+1, C) parameter added after the cls
token concat, and dropout p=0.1 throughout.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    embedding_dim: int
    head_num: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, _ = x.shape
        hd = self.embedding_dim // self.head_num
        dk = hd ** 0.5  # multiplied, not divided (reference quirk)
        qkv = nn.Dense(self.embedding_dim * 3, use_bias=False,
                       dtype=x.dtype, name='qkv_layer')(x)
        qkv = qkv.reshape(b, t, hd, 3, self.head_num)
        q = qkv[:, :, :, 0].transpose(0, 3, 1, 2)
        k = qkv[:, :, :, 1].transpose(0, 3, 1, 2)
        v = qkv[:, :, :, 2].transpose(0, 3, 1, 2)
        energy = jnp.einsum('bhid,bhjd->bhij', q, k) * dk
        attention = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum('bhij,bhjd->bhid', attention, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.embedding_dim)
        return nn.Dense(self.embedding_dim, use_bias=False, dtype=x.dtype,
                        name='out_attention')(out)


class MLP(nn.Module):
    embedding_dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.mlp_dim, dtype=x.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = nn.Dense(self.embedding_dim, dtype=x.dtype, name='fc2')(x)
        return nn.Dropout(0.1, deterministic=not train)(x)


class TransformerEncoderBlock(nn.Module):
    """post-LN block (reference order: attn → add → LN, mlp → add → LN)."""
    embedding_dim: int
    head_num: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = MultiHeadAttention(self.embedding_dim, self.head_num,
                               name='multi_head_attention')(x, train=train)
        a = nn.Dropout(0.1, deterministic=not train)(a)
        x = nn.LayerNorm(epsilon=1e-5, name='layer_norm1', dtype=x.dtype)(x + a)
        m = MLP(self.embedding_dim, self.mlp_dim, name='mlp')(x, train=train)
        return nn.LayerNorm(epsilon=1e-5, name='layer_norm2', dtype=x.dtype)(x + m)


class ViT(nn.Module):
    """Patchify → project → cls token + learned pos-embed → N blocks
    (reference ``vit.py:93``)."""
    img_dim: int
    in_channels: int
    embedding_dim: int
    head_num: int
    mlp_dim: int
    block_num: int
    patch_dim: int = 1
    classification: bool = False
    num_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C) NHWC
        p = self.patch_dim
        b, h, w, c = x.shape
        tokens = (h // p) * (w // p)
        # reference vit.py:118-120 einops '(patch_x x)': the PATCH factor is
        # the SLOW axis — H splits into p contiguous bands of h/p rows (not
        # the standard p-row windows). Inert at the shipped patch_dim=1 but
        # checkpoint-bearing for any other patch size.
        patches = x.reshape(b, p, h // p, p, w // p, c)
        patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(
            b, tokens, p * p * c)
        project = nn.Dense(self.embedding_dim, dtype=x.dtype,
                           name='projection')(patches)
        cls_token = self.param('cls_token',
                               nn.initializers.normal(1.0),
                               (1, 1, self.embedding_dim), jnp.float32)
        embedding = self.param('embedding',
                               nn.initializers.uniform(1.0),
                               ((self.img_dim // self.patch_dim) ** 2 + 1,
                                self.embedding_dim), jnp.float32)
        token = jnp.broadcast_to(cls_token,
                                 (b, 1, self.embedding_dim)).astype(x.dtype)
        xs = jnp.concatenate([token, project], axis=1)
        xs = xs + embedding[:tokens + 1].astype(x.dtype)
        xs = nn.Dropout(0.1, deterministic=not train)(xs)
        for i in range(self.block_num):
            xs = TransformerEncoderBlock(
                self.embedding_dim, self.head_num, self.mlp_dim,
                name=f'layer_blocks_{i}')(xs, train=train)
        if self.classification:
            return nn.Dense(self.num_classes, dtype=x.dtype,
                            name='mlp_head')(xs[:, 0])
        return xs[:, 1:]
