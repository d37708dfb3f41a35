"""DAHead (≙ reference ``decode_heads/da_head.py``): dual attention —
position attention (PAM) + channel attention (CAM), fused.

The reference returns a (pam_cam, pam, cam) logits tuple in training and
pam_cam alone at inference; here the auxiliary pam/cam logits are folded
into the loss via ``loss_by_feat`` overrides.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..bricks import Conv2d, ConvModule, Dropout2d
from ..builder import HEADS
from ..utils.self_attention_block import SelfAttentionBlock
from .decode_head import BaseDecodeHead


class PAM(SelfAttentionBlock):
    """Position attention module (reference ``da_head.py:13-47``): a
    SelfAttentionBlock with plain-conv projections to ``pam_channels``
    (key_query_norm/value_out_norm False, matmul_norm False, with_out
    False), plus a zero-initialized residual scale (mmcv ``Scale(0)``)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = super().__call__(x, x, train=train)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return gamma * out + x


class CAM(nn.Module):
    """Channel attention with a learned residual scale."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, -1, c)
        energy = jnp.einsum('bpc,bpd->bcd', flat, flat)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum('bcd,bpd->bpc', attn, flat).reshape(b, h, w, c)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return gamma * out + x


@HEADS.register_module()
class DAHead(BaseDecodeHead):
    """Dual-attention head."""
    pam_channels: int = 64

    def _branch_cls(self, feat, name, train):
        if self.dropout_ratio > 0:
            feat = Dropout2d(self.dropout_ratio, name=f'{name}_dropout')(
                feat, train=train)
        return Conv2d(self.final_out_channels, 1, name=f'{name}_conv_seg')(
            feat)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = self._transform_inputs(inputs)
        pam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='pam_in_conv')(x, train=train)
        # reference ``da_head.py:113``: PAM(self.channels, pam_channels) —
        # key/query project to pam_channels, value/out to self.channels
        pam = PAM(key_in_channels=self.channels,
                  query_in_channels=self.channels,
                  channels=self.pam_channels, out_channels=self.channels,
                  share_key_query=False, key_query_num_convs=1,
                  value_out_num_convs=1, key_query_norm=False,
                  value_out_norm=False, matmul_norm=False, with_out=False,
                  name='pam')(pam, train=train)
        pam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='pam_out_conv')(pam, train=train)
        cam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='cam_in_conv')(x, train=train)
        cam = CAM(name='cam')(cam)
        cam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         name='cam_out_conv')(cam, train=train)
        feat_sum = pam + cam
        pam_cam_out = self.cls_seg(feat_sum, train=train)
        # branch classifiers always constructed (params must exist at init);
        # eval returns the fused logits only (reference da_head.py:160)
        pam_out = self._branch_cls(pam, 'pam', train)
        cam_out = self._branch_cls(cam, 'cam', train)
        if not train:
            return pam_cam_out
        return pam_cam_out, pam_out, cam_out

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        """Sum pam_cam + 0-weighted? No — reference adds all three branch
        losses with prefixes (reference ``da_head.py:168-178``)."""
        if not isinstance(seg_logit, tuple):
            return super().loss_by_feat(seg_logit, seg_label, seg_weight)
        pam_cam, pam, cam = seg_logit
        loss = {}
        for name, logit in [('pam_cam', pam_cam), ('pam', pam),
                            ('cam', cam)]:
            sub = super().loss_by_feat(logit, seg_label, seg_weight)
            for k, value in sub.items():
                if k == 'acc_seg' and name != 'pam_cam':
                    continue
                loss[f'{name}.{k}' if name != 'pam_cam' else k] = value
        return loss
