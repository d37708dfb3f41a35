"""BaseDecodeHead (≙ reference ``mmseg/models/decode_heads/decode_head.py:15``).

A flax.linen base class for decode heads. Subclasses implement
``__call__(inputs, train=False) -> seg_logits`` (NHWC, class axis last).
Loss computation (``loss_by_feat``) is a pure method usable outside apply —
it consumes logits + labels and the head's static loss configs, mirroring
``BaseDecodeHead.losses`` (reference ``decode_head.py:262-296``).
"""
from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import Conv2d, Dropout2d
from ..builder import build_loss
from ..losses import accuracy


def _default_loss():
    return dict(type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0)


def resolve_out_channels(num_classes: int, out_channels: Optional[int],
                         threshold: Optional[float]):
    """Replicate the out_channels/threshold resolution of the reference
    (``decode_head.py:92-114``)."""
    if out_channels is None:
        out_channels = num_classes
    if out_channels != num_classes and out_channels != 1:
        raise ValueError(
            'out_channels should equal num_classes, except binary '
            f'segmentation (out_channels==1, num_classes==2); got '
            f'out_channels={out_channels}, num_classes={num_classes}')
    if out_channels == 1 and threshold is None:
        threshold = 0.3
        warnings.warn('threshold is not defined for binary, defaults to 0.3')
    return out_channels, threshold


class BaseDecodeHead(nn.Module):
    """Base decode head. Fields mirror the reference ctor args."""

    num_classes: int = 2
    in_channels: Any = 64
    channels: int = 64
    out_channels: Optional[int] = None
    threshold: Optional[float] = None
    dropout_ratio: float = 0.1
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = dataclasses.field(
        default_factory=lambda: dict(type='ReLU'))
    in_index: Any = -1
    input_transform: Optional[str] = None
    loss_decode: Any = dataclasses.field(default_factory=_default_loss)
    ignore_index: int = 255
    sampler: Optional[dict] = None
    align_corners: bool = False
    init_cfg: Optional[dict] = None
    # K-Net hook: cls_seg returns (logits, pre-dropout feats) when set
    return_feat: bool = False

    # -- static (non-flax) helpers -----------------------------------------

    def __post_init__(self):
        # the reference's ``_init_inputs`` contract
        # (``decode_head.py:166-181``), enforced at construction: with a
        # transform, in_channels/in_index are equal-length sequences; with
        # none, both are ints — otherwise ``_transform_inputs`` would
        # silently pick level -1. Validation only (flax fields are
        # frozen); heads needing summed channels compute them themselves.
        if self.input_transform is not None:
            assert self.input_transform in ('resize_concat',
                                            'multiple_select'), \
                (f"input_transform must be 'resize_concat' or "
                 f"'multiple_select', got {self.input_transform!r}")
            assert isinstance(self.in_channels, (list, tuple)), \
                'in_channels must be a list/tuple with input_transform'
            assert isinstance(self.in_index, (list, tuple)), \
                'in_index must be a list/tuple with input_transform'
            assert len(self.in_channels) == len(self.in_index), \
                (f'in_channels ({len(self.in_channels)}) and in_index '
                 f'({len(self.in_index)}) must have equal length')
        else:
            assert isinstance(self.in_channels, int), \
                'in_channels must be an int without input_transform'
            assert isinstance(self.in_index, int), \
                'in_index must be an int without input_transform'
        super().__post_init__()

    @property
    def final_out_channels(self) -> int:
        out, _ = resolve_out_channels(self.num_classes, self.out_channels,
                                      self.threshold)
        return out

    @property
    def final_threshold(self) -> Optional[float]:
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter('ignore')
            _, thr = resolve_out_channels(self.num_classes, self.out_channels,
                                          self.threshold)
        return thr

    def _transform_inputs(self, inputs):
        """Select/merge backbone feature levels (reference ``:183-208``)."""
        if self.input_transform == 'resize_concat':
            xs = [inputs[i] for i in self.in_index]
            ups = [resize(x, size=xs[0].shape[1:3], mode='bilinear',
                          align_corners=self.align_corners, warning=False)
                   for x in xs]
            return jnp.concatenate(ups, axis=-1)
        if self.input_transform == 'multiple_select':
            idx = self.in_index
            if isinstance(idx, int):
                idx = [idx]
            return [inputs[i] for i in idx]
        idx = self.in_index
        if not isinstance(idx, int):
            idx = idx[0] if len(idx) == 1 else -1
        return inputs[idx]

    def cls_seg(self, feat, train: bool = False):
        """Dropout2d + 1x1 conv classifier (reference ``:254``).

        Must be called from inside the subclass's compact ``__call__``.
        With ``return_feat=True`` also returns the pre-dropout feature map
        (≙ the reference's ``_forward_feature`` split — K-Net's
        IterativeDecodeHead needs the generate head's features AND logits,
        reference ``knet_head.py:434-436``).
        """
        pre = feat
        if self.dropout_ratio > 0:
            feat = Dropout2d(self.dropout_ratio, name='dropout')(
                feat, train=train)
        logits = Conv2d(self.final_out_channels, kernel_size=1,
                        name='conv_seg')(feat)
        if getattr(self, 'return_feat', False):
            return logits, pre
        return logits

    # -- loss (pure; no flax state) -----------------------------------------

    def build_losses(self):
        cfg = self.loss_decode
        if isinstance(cfg, dict):
            return [build_loss(dict(cfg))]
        return [build_loss(dict(c)) for c in cfg]

    def loss_by_feat(self, seg_logit, seg_label, seg_weight=None) -> dict:
        """Compute the loss dict from raw head logits + labels.

        seg_logit: (N, h, w, C); seg_label: (N, H, W) int. Mirrors reference
        ``losses()`` (decode_head.py:262): resize logits to label size,
        optional pixel weights, sum same-``loss_name`` entries, add acc_seg.
        The fp32 boundary (≙ @force_fp32) is enforced by casting logits.
        """
        seg_logit = seg_logit.astype(jnp.float32)
        seg_logit = resize(seg_logit, size=seg_label.shape[1:3],
                           mode='bilinear', align_corners=self.align_corners,
                           warning=False)
        if self.sampler is not None:
            from stc_unet_tpu.core import build_pixel_sampler
            sampler = build_pixel_sampler(dict(self.sampler), context=self)
            seg_weight = sampler.sample(seg_logit, seg_label)
        loss = {}
        for loss_decode in self.build_losses():
            value = loss_decode(seg_logit, seg_label, weight=seg_weight,
                                ignore_index=self.ignore_index)
            if loss_decode.loss_name not in loss:
                loss[loss_decode.loss_name] = value
            else:
                loss[loss_decode.loss_name] += value
        loss['acc_seg'] = accuracy(seg_logit, seg_label,
                                   ignore_index=self.ignore_index)
        return loss
