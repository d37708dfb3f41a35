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
        # reference init: codewords uniform(-std, std), scale uniform(-1, 0)
        # (``ops/encoding.py:22-31``). The shift must live in the INITIALIZER,
        # not the forward — a forward-time `param - std` would silently
        # offset converted/loaded checkpoints (caught by
        # tests/test_models/test_heads/test_stock_head_oracles.py).
        def _uniform(lo, hi):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, lo, hi)
            return init
        codewords = self.param('codewords', _uniform(-std, std), (k, c))
        scale = self.param('scale', _uniform(-1.0, 0.0), (k,))
        b = x.shape[0]
        flat = x.reshape(b, -1, c)
        # residuals (B, N, K, C)
        resid = flat[:, :, None, :] - codewords[None, None]
        dist = (resid ** 2).sum(-1) * scale[None, None]
        assign = jax.nn.softmax(dist, axis=-1)  # (B, N, K)
        encoded = jnp.einsum('bnk,bnkc->bkc', assign, resid)
        return encoded
