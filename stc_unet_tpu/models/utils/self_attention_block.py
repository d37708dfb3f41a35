"""Generic self-attention block (≙ reference
``models/utils/self_attention_block.py:8``) — the query/key/value projection
machinery shared by OCR/NL/DA/ANN-style heads. NHWC; the attention matmul
maps to one batched MXU einsum over (B, HW_q, HW_k).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..bricks import Conv2d, ConvModule, max_pool2d


class SelfAttentionBlock(nn.Module):
    """key/query/value projected attention with optional downsampling.

    ``key_feats`` may be a spatial map (B, H, W, C) or a token map
    (B, K, C) — OCR's object-context path uses the latter.
    """
    key_in_channels: int
    query_in_channels: int
    channels: int
    out_channels: int
    share_key_query: bool = False
    query_downsample: Optional[int] = None  # maxpool kernel or None
    key_downsample: Optional[int] = None
    key_query_num_convs: int = 1
    value_out_num_convs: int = 1
    key_query_norm: bool = False
    value_out_norm: bool = False
    matmul_norm: bool = False
    with_out: bool = True
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    def _make_proj(self, channels, num_convs, use_norm, name,
                   zero_init=False):
        """Construct the 1x1 conv stack once (shareable).

        ``use_norm`` ≙ reference ``use_conv_module``: True → ConvModule with
        norm+act; False → plain conv (bias, no norm). ``zero_init`` replicates
        the reference's ``constant_init(self.out_project, 0)``
        (``self_attention_block.py:95-99``): it fires only when out_project
        is a single plain conv — mmcv ``constant_init`` is a no-op on
        ``nn.Sequential`` (no ``.weight``), and ConvModules are skipped
        explicitly — so callers pass ``zero_init`` only in that case.
        """
        if use_norm:
            return [ConvModule(
                channels, 1, norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                name=f'{name}_{i}') for i in range(num_convs)]
        init = {'kernel_init': jax.nn.initializers.zeros} if zero_init else {}
        return [Conv2d(channels, 1, name=f'{name}_{i}', **init)
                for i in range(num_convs)]

    def _key_value_downsample(self, key, value):
        """Downsample the PROJECTED key/value maps (reference
        ``self_attention_block.py:143-145``); overridable hook."""
        if self.key_downsample and key.ndim == 4:
            key = max_pool2d(key, self.key_downsample)
            value = max_pool2d(value, self.key_downsample)
        return key, value

    @staticmethod
    def _apply_proj(mods, x, train):
        spatial = x.ndim == 4
        if not spatial:  # (B, K, C) tokens → fake height axis for convs
            x = x[:, :, None, :]
        for m in mods:
            x = m(x, train=train) if isinstance(m, ConvModule) else m(x)
        if not spatial:
            x = x[:, :, 0, :]
        return x

    @nn.compact
    def __call__(self, query_feats, key_feats, train: bool = False):
        b = query_feats.shape[0]
        query_mods = self._make_proj(self.channels,
                                     self.key_query_num_convs,
                                     self.key_query_norm, 'query_project')
        key_mods = query_mods if self.share_key_query else self._make_proj(
            self.channels, self.key_query_num_convs, self.key_query_norm,
            'key_project')
        # mmseg semantics: value projects to `channels` when a separate
        # out-projection follows, else straight to `out_channels`
        value_mods = self._make_proj(
            self.channels if self.with_out else self.out_channels,
            self.value_out_num_convs, self.value_out_norm, 'value_project')
        query = self._apply_proj(query_mods, query_feats, train)
        key = self._apply_proj(key_mods, key_feats, train)
        value = self._apply_proj(value_mods, key_feats, train)
        if self.query_downsample and query.ndim == 4:
            query = max_pool2d(query, self.query_downsample)
        # reference order (``self_attention_block.py:141-145``): the key and
        # value maps are downsampled AFTER projection — the key projection's
        # ReLU does not commute with pooling, so subclasses overriding
        # ``_key_value_downsample`` (ANN's PPM sampling) must hook here, not
        # pre-pool their inputs.
        key, value = self._key_value_downsample(key, value)

        q_spatial = query.shape[1:-1]  # () for tokens, (H, W) for maps
        q = query.reshape(b, -1, self.channels)
        k = key.reshape(b, -1, self.channels)
        v = value.reshape(b, -1, value.shape[-1])
        sim = jnp.einsum('bqc,bkc->bqk', q, k)
        if self.matmul_norm:
            sim = (self.channels ** -0.5) * sim
        sim = jax.nn.softmax(sim, axis=-1)
        context = jnp.einsum('bqk,bkc->bqc', sim, v)
        context = context.reshape((b,) + q_spatial + (context.shape[-1],))
        if self.with_out:
            # reference: out_project mirrors the value projection's
            # num_convs/use_conv_module (``self_attention_block.py:77-85``);
            # a SINGLE plain-conv out_project is zero-initialized
            # (``constant_init(self.out_project, 0)``, which no-ops on
            # Sequential/ConvModule — see _make_proj docstring)
            out_mods = self._make_proj(
                self.out_channels, self.value_out_num_convs,
                self.value_out_norm, 'out_project',
                zero_init=(not self.value_out_norm
                           and self.value_out_num_convs == 1))
            context = self._apply_proj(out_mods, context, train)
        return context
