"""K-Net heads (≙ reference ``decode_heads/knet_head.py:457`` —
IterativeDecodeHead / KernelUpdateHead / KernelUpdator).

Dynamic-kernel segmentation: a generate head produces seed logits and a
feature map; each stage mask-pools per-class features, updates the class
kernels through a gated linear unit + kernel self-attention, and re-predicts
the masks. All stages are static-count python loops — one XLA program.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..builder import HEADS, build_head
from .decode_head import BaseDecodeHead


@HEADS.register_module()
class KernelUpdator(nn.Module):
    """Adaptive gated kernel update (reference ``KernelUpdator``; registered
    in HEADS like the reference ``knet_head.py`` ``__all__``)."""
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: Optional[int] = None
    gate_sigmoid: bool = True
    gate_norm_act: bool = False
    activate_out: bool = False

    @nn.compact
    def __call__(self, update_feature, input_feature):
        """update_feature (B*K, C) pooled feats; input_feature (B*K, C)
        kernels → updated kernels (B*K, C)."""
        c = self.feat_channels
        out_c = self.out_channels or self.in_channels
        param_in = nn.Dense(c * 2, name='dynamic_layer',
                            dtype=update_feature.dtype)(update_feature)
        param1, param2 = param_in[..., :c], param_in[..., c:]
        input_feats = nn.Dense(c * 2, name='input_layer',
                               dtype=input_feature.dtype)(input_feature)
        input1, input2 = input_feats[..., :c], input_feats[..., c:]
        gate_feats = input1 * param1
        if self.gate_norm_act:
            gate_feats = nn.gelu(nn.LayerNorm(
                name='gate_norm', dtype=gate_feats.dtype)(gate_feats))
        input_gate = nn.LayerNorm(name='input_norm_in',
                                  dtype=gate_feats.dtype)(
            nn.Dense(c, name='input_gate',
                     dtype=gate_feats.dtype)(gate_feats))
        update_gate = nn.LayerNorm(name='update_norm_in',
                                   dtype=gate_feats.dtype)(
            nn.Dense(c, name='update_gate',
                     dtype=gate_feats.dtype)(gate_feats))
        if self.gate_sigmoid:
            input_gate = nn.sigmoid(input_gate)
            update_gate = nn.sigmoid(update_gate)
        param2 = nn.LayerNorm(name='norm_in', dtype=param2.dtype)(param2)
        input2 = nn.LayerNorm(name='input_norm_out',
                              dtype=input2.dtype)(input2)
        features = update_gate * param2 + input_gate * input2
        features = nn.Dense(out_c, name='fc_layer',
                            dtype=features.dtype)(features)
        features = nn.LayerNorm(name='fc_norm',
                                dtype=features.dtype)(features)
        return nn.gelu(features)


@HEADS.register_module()
class KernelUpdateHead(nn.Module):
    """One K-Net refinement stage (reference ``KernelUpdateHead``)."""
    num_classes: int = 150
    num_heads: int = 8
    num_ffn_fcs: int = 2
    feedforward_channels: int = 2048
    in_channels: int = 256
    out_channels: int = 256
    dropout: float = 0.0
    kernel_updator_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, proposal_feat, mask_preds, train: bool = False):
        """x (B, H, W, C); proposal_feat (B, K, C) kernels;
        mask_preds (B, H, W, K) → (new_mask_preds, new_kernels)."""
        b, h, w, c = x.shape
        k = self.num_classes
        # mask-pool features per kernel
        sigmoid_masks = jax.nn.softmax(mask_preds, axis=-1)
        pooled = jnp.einsum('bhwk,bhwc->bkc', sigmoid_masks, x)
        # kernel update
        upd_cfg = dict(self.kernel_updator_cfg or {})
        upd_cfg.pop('type', None)
        upd = KernelUpdator(in_channels=c, feat_channels=self.in_channels,
                            out_channels=self.in_channels,
                            name='kernel_update_conv', **{
                                kk: vv for kk, vv in upd_cfg.items()
                                if kk in ('gate_sigmoid', 'gate_norm_act',
                                          'activate_out')})
        kernels = upd(pooled.reshape(b * k, -1),
                      proposal_feat.reshape(b * k, -1)).reshape(b, k, -1)
        # kernel interaction: MHA over the K kernels
        q = kernels
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=q.dtype,
            name='attention')(q, q)
        kernels = nn.LayerNorm(name='attention_norm',
                               dtype=q.dtype)(q + attn)
        # FFN
        ffn = kernels
        for i in range(self.num_ffn_fcs - 1):
            ffn = nn.gelu(nn.Dense(self.feedforward_channels,
                                   dtype=ffn.dtype, name=f'ffn_fc{i}')(ffn))
        ffn = nn.Dense(kernels.shape[-1], dtype=ffn.dtype,
                       name='ffn_out')(ffn)
        kernels = nn.LayerNorm(name='ffn_norm',
                               dtype=kernels.dtype)(kernels + ffn)
        # mask head: project kernels, dot with features
        mask_kernels = nn.Dense(c, dtype=kernels.dtype,
                                name='fc_mask')(kernels)
        new_masks = jnp.einsum('bkc,bhwc->bhwk', mask_kernels, x)
        return new_masks, kernels


@HEADS.register_module()
class IterativeDecodeHead(BaseDecodeHead):
    """K-Net iterative decode head (reference ``IterativeDecodeHead``)."""
    num_stages: int = 3
    kernel_generate_head: Optional[dict] = None
    kernel_update_head: Any = None

    @property
    def final_out_channels(self):
        return (self.kernel_generate_head or {}).get(
            'num_classes', self.num_classes)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        gen_cfg = dict(self.kernel_generate_head)
        gen_head = build_head(gen_cfg)
        seg = gen_head(inputs, train=train)  # (B, h, w, K)
        feats = inputs[gen_cfg.get('in_index', -1)] \
            if not isinstance(gen_cfg.get('in_index', -1), (list, tuple)) \
            else inputs[-1]
        k = seg.shape[-1]
        c = feats.shape[-1]
        if seg.shape[1:3] != feats.shape[1:3]:
            seg_r = resize(seg, size=feats.shape[1:3], mode='bilinear',
                           align_corners=self.align_corners, warning=False)
        else:
            seg_r = seg
        kernels = self.param('init_kernels',
                             nn.initializers.normal(0.02), (1, k, c),
                             jnp.float32)
        kernels = jnp.broadcast_to(kernels,
                                   (feats.shape[0], k, c)).astype(
            feats.dtype)
        stage_segs = [seg]
        from collections.abc import Mapping
        upd_cfgs = self.kernel_update_head
        if isinstance(upd_cfgs, Mapping):  # incl. flax FrozenDict
            upd_cfgs = [upd_cfgs] * self.num_stages
        masks = seg_r
        for i in range(self.num_stages):
            cfg = dict(upd_cfgs[i]) if upd_cfgs else {}
            cfg.pop('type', None)
            allowed = ('num_classes', 'num_heads', 'num_ffn_fcs',
                       'feedforward_channels', 'in_channels',
                       'out_channels', 'dropout', 'kernel_updator_cfg')
            cfg = {kk: vv for kk, vv in cfg.items() if kk in allowed}
            cfg.setdefault('num_classes', k)
            masks, kernels = KernelUpdateHead(
                name=f'kernel_update_head_{i}', **cfg)(
                feats, kernels, masks, train=train)
            stage_segs.append(masks)
        if train:
            return stage_segs
        return stage_segs[-1]

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        if not isinstance(seg_logit, list):
            return super().loss_by_feat(seg_logit, seg_label, seg_weight)
        losses = {}
        for i, logit in enumerate(seg_logit):
            sub = super().loss_by_feat(logit, seg_label, seg_weight)
            for kk, vv in sub.items():
                losses[f's{i}.{kk}'] = vv
        return losses
