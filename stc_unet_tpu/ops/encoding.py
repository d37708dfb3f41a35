"""Learned codebook residual encoding (≙ reference ``mmseg/ops/encoding.py:7``,
EncNet)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Encoding(nn.Module):
    """Aggregate residuals to K learned codewords with soft assignment."""
    channels: int
    num_codes: int

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) or (B, N, C) → (B, num_codes, C)."""
        c, k = self.channels, self.num_codes
        std = 1.0 / ((k * c) ** 0.5)
        codewords = self.param('codewords',
                               nn.initializers.uniform(2 * std), (k, c),
                               jnp.float32) - std
        # reference init: uniform(-1, 0) (``ops/encoding.py:28-30``)
        scale = self.param('scale', nn.initializers.uniform(1.0),
                           (k,), jnp.float32) - 1.0
        b = x.shape[0]
        flat = x.reshape(b, -1, c)
        # residuals (B, N, K, C)
        resid = flat[:, :, None, :] - codewords[None, None]
        dist = (resid ** 2).sum(-1) * scale[None, None]
        assign = jax.nn.softmax(dist, axis=-1)  # (B, N, K)
        encoded = jnp.einsum('bnk,bnkc->bkc', assign, resid)
        return encoded
