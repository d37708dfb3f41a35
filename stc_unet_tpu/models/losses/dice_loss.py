"""Dice loss (≙ reference ``losses/dice_loss.py:51``), class axis LAST."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weighted_loss


@weighted_loss
def dice_loss(pred, target, valid_mask, smooth=1, exponent=2,
              class_weight=None, ignore_index=255):
    """Mean per-class binary dice. pred (N,...,C) softmaxed; target one-hot."""
    num_classes = pred.shape[-1]
    total_loss = 0
    for i in range(num_classes):
        if i != ignore_index:
            d = binary_dice_loss(pred[..., i], target[..., i],
                                 valid_mask=valid_mask, smooth=smooth,
                                 exponent=exponent, reduction='none')
            if class_weight is not None:
                d = d * class_weight[i]
            total_loss = total_loss + d
    return total_loss / num_classes


@weighted_loss
def binary_dice_loss(pred, target, valid_mask, smooth=1, exponent=2, **kwargs):
    """Per-sample binary dice over flattened pixels (reference ``:38``)."""
    n = pred.shape[0]
    pred = pred.reshape(n, -1)
    target = target.reshape(n, -1).astype(pred.dtype)
    valid_mask = valid_mask.reshape(n, -1).astype(pred.dtype)
    num = jnp.sum(pred * target * valid_mask, axis=1) * 2 + smooth
    den = jnp.sum(pred ** exponent + target ** exponent, axis=1) + smooth
    return 1 - num / den


@LOSSES.register_module()
class DiceLoss:
    """V-Net dice loss with mmseg semantics (reference ``dice_loss.py:51``)."""

    def __init__(self, smooth=1, exponent=2, reduction='mean',
                 class_weight=None, loss_weight=1.0, ignore_index=255,
                 loss_name='loss_dice', **kwargs):
        self.smooth = smooth
        self.exponent = exponent
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        assert reduction_override in (None, 'none', 'mean', 'sum')
        reduction = reduction_override if reduction_override else self.reduction
        class_weight = (jnp.asarray(self.class_weight, jnp.float32)
                        if self.class_weight is not None else None)
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        num_classes = pred.shape[-1]
        onehot = jax.nn.one_hot(
            jnp.clip(target, 0, num_classes - 1).astype(jnp.int32),
            num_classes, dtype=jnp.float32)
        valid_mask = (target != self.ignore_index).astype(jnp.int32)
        # note: the per-pixel sampler weight is not applicable to a
        # per-sample dice vector; mmseg ignores `weight` here too (its
        # dice_loss receives weight=None from the head path).
        return self.loss_weight * dice_loss(
            pred, onehot, valid_mask=valid_mask, reduction=reduction,
            avg_factor=avg_factor, smooth=self.smooth,
            exponent=self.exponent, class_weight=class_weight,
            ignore_index=self.ignore_index)

    @property
    def loss_name(self):
        return self._loss_name
