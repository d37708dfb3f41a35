"""Tversky loss (≙ reference ``losses/tversky_loss.py``), class axis LAST."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weighted_loss


@weighted_loss
def binary_tversky_loss(pred, target, valid_mask, alpha=0.3, beta=0.7,
                        smooth=1):
    n = pred.shape[0]
    pred = pred.reshape(n, -1)
    target = target.reshape(n, -1).astype(pred.dtype)
    valid_mask = valid_mask.reshape(n, -1).astype(pred.dtype)
    tp = jnp.sum(pred * target * valid_mask, axis=1)
    fp = jnp.sum(pred * (1 - target) * valid_mask, axis=1)
    fn = jnp.sum((1 - pred) * target * valid_mask, axis=1)
    tversky = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1 - tversky


@weighted_loss
def tversky_loss(pred, target, valid_mask, alpha=0.3, beta=0.7, smooth=1,
                 class_weight=None, ignore_index=255):
    num_classes = pred.shape[-1]
    total_loss = 0
    for i in range(num_classes):
        if i != ignore_index:
            t = binary_tversky_loss(pred[..., i], target[..., i],
                                    valid_mask=valid_mask, alpha=alpha,
                                    beta=beta, smooth=smooth,
                                    reduction='none')
            if class_weight is not None:
                t = t * class_weight[i]
            total_loss = total_loss + t
    return total_loss / num_classes


@LOSSES.register_module()
class TverskyLoss:
    """Tversky loss (reference ``tversky_loss.py``): dice generalization
    with separate FP (alpha) and FN (beta) weights."""

    def __init__(self, smooth=1, class_weight=None, loss_weight=1.0,
                 ignore_index=255, alpha=0.3, beta=0.7,
                 loss_name='loss_tversky'):
        assert (alpha + beta == 1.0), 'Sum of alpha and beta must be 1.0!'
        self.smooth = smooth
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self.alpha = alpha
        self.beta = beta
        self._loss_name = loss_name

    def __call__(self, pred, target, **kwargs):
        class_weight = (jnp.asarray(self.class_weight, jnp.float32)
                        if self.class_weight is not None else None)
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        num_classes = pred.shape[-1]
        one_hot = jax.nn.one_hot(
            jnp.clip(target, 0, num_classes - 1).astype(jnp.int32),
            num_classes, dtype=jnp.float32)
        valid_mask = (target != self.ignore_index).astype(jnp.int32)
        return self.loss_weight * tversky_loss(
            pred, one_hot, valid_mask=valid_mask, reduction='mean',
            alpha=self.alpha, beta=self.beta, smooth=self.smooth,
            class_weight=class_weight, ignore_index=self.ignore_index)

    @property
    def loss_name(self):
        return self._loss_name


@LOSSES.register_module()
class L1Loss:
    """Author-added L1 loss on the argmax map (reference ``l1_loss.py``;
    faithful port — the argmax makes it gradient-free, and foreground
    pixels are upweighted x50)."""

    def __init__(self, loss_weight=1.0, reduction='mean',
                 loss_name='l1_loss', sample_wise=False):
        if reduction not in ('none', 'mean', 'sum'):
            raise ValueError(f'Unsupported reduction mode: {reduction}')
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.sample_wise = sample_wise
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, **kwargs):
        seg_pred = jnp.argmax(jax.nn.softmax(pred, axis=-1),
                              axis=-1).astype(jnp.float32)
        target = jnp.where(target == 255, 0, target).astype(jnp.float32)
        loss_map = self.loss_weight * jnp.abs(seg_pred - target)
        error_map = jnp.where(target > 0, 50.0, 1.0)
        return jnp.mean(error_map * loss_map) * self.loss_weight

    @property
    def loss_name(self):
        return self._loss_name


@LOSSES.register_module()
class IOULoss:
    """Author-added soft-IoU loss (reference ``iou_loss.py``; BASNet-style).

    pred is softmaxed and compared against the one-hot target."""

    def __init__(self, loss_weight=1, size_average=True,
                 loss_name='iou_loss'):
        self.loss_weight = loss_weight
        self.size_average = size_average
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, **kwargs):
        pred = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        if target.ndim == pred.ndim - 1:
            num_classes = pred.shape[-1]
            target = jax.nn.one_hot(
                jnp.clip(target, 0, num_classes - 1).astype(jnp.int32),
                num_classes, dtype=jnp.float32)
        n = pred.shape[0]
        axes = tuple(range(1, pred.ndim))
        inter = jnp.sum(target * pred, axis=axes)
        union = jnp.sum(target, axis=axes) + jnp.sum(pred, axis=axes) - inter
        iou = jnp.mean(1 - inter / union)
        return iou * self.loss_weight

    @property
    def loss_name(self):
        return self._loss_name
