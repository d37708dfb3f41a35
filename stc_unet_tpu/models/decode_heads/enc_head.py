"""EncHead (≙ reference ``decode_heads/enc_head.py``, 188 LoC): context
encoding with the learned codebook + optional se-loss (present-class BCE)."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from stc_unet_tpu.ops.encoding import Encoding
from ..bricks import BatchNorm, ConvModule, Linear
from ..builder import HEADS, build_loss
from .decode_head import BaseDecodeHead


class EncModule(nn.Module):
    """Encoding + channel gating (reference EncModule)."""
    channels: int
    num_codes: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                          act_cfg=self.act_cfg, name='encoding_project')(
            x, train=train)
        encoded = Encoding(self.channels, self.num_codes,
                           name='encoding')(feat)
        # reference ``enc_head.py:44-47``: nn.BatchNorm1d(num_codes) on the
        # (B, K, C) encoding — the normalized features are the K CODES
        # (stats over batch x channels), not the channels; put K last for
        # the NHWC BatchNorm brick and restore the layout after
        encoded = BatchNorm(name='encoding_norm')(
            encoded.transpose(0, 2, 1)[:, :, None, :],
            train=train)[:, :, 0, :].transpose(0, 2, 1)
        encoded = nn.relu(encoded)
        feat_sum = encoded.mean(axis=1)  # (B, C)
        gamma = nn.sigmoid(Linear(self.channels, name='fc')(feat_sum))
        y = x * gamma[:, None, None, :]
        return nn.relu(x + y), feat_sum


@HEADS.register_module()
class EncHead(BaseDecodeHead):
    """Context encoding head."""
    num_codes: int = 32
    in_index: object = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    use_se_loss: bool = True
    add_lateral: bool = False
    loss_se_decode: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        inputs = self._transform_inputs(inputs)
        feat = ConvModule(self.channels, 3, padding=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name='bottleneck')(inputs[-1], train=train)
        if self.add_lateral:
            laterals = [
                resize(ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                                  act_cfg=self.act_cfg,
                                  name=f'lateral_convs_{i}')(inp,
                                                             train=train),
                       size=feat.shape[1:3], mode='bilinear',
                       align_corners=self.align_corners, warning=False)
                for i, inp in enumerate(inputs[:-1])
            ]
            feat = ConvModule(self.channels, 3, padding=1,
                              norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                              name='fusion')(
                jnp.concatenate([feat] + laterals, axis=-1), train=train)
        output, feat_sum = EncModule(self.channels, self.num_codes,
                                     norm_cfg=self.norm_cfg,
                                     act_cfg=self.act_cfg,
                                     name='enc_module')(feat, train=train)
        seg = self.cls_seg(output, train=train)
        if self.use_se_loss:
            se_out = Linear(self.num_classes, name='se_layer')(feat_sum)
            return seg, se_out
        return seg

    @staticmethod
    def _convert_to_onehot_labels(seg_label, num_classes):
        """Per-image present-class vector (reference ``enc_head.py:165``)."""
        onehot = jax.nn.one_hot(
            jnp.clip(seg_label, 0, num_classes - 1), num_classes)
        valid = (seg_label >= 0) & (seg_label < num_classes)
        onehot = onehot * valid[..., None]
        return (onehot.sum(axis=(1, 2)) > 0).astype(jnp.float32)

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        if not isinstance(seg_logit, tuple):
            return super().loss_by_feat(seg_logit, seg_label, seg_weight)
        seg, se_out = seg_logit
        loss = super().loss_by_feat(seg, seg_label, seg_weight)
        se_cfg = dict(self.loss_se_decode or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=0.2))
        se_loss_fn = build_loss(se_cfg)
        onehot = self._convert_to_onehot_labels(seg_label, self.num_classes)
        loss['loss_se'] = se_loss_fn(se_out, onehot)
        return loss
