"""Sigmoid focal loss (≙ reference ``losses/focal_loss.py``; pure-jnp — the
reference's CUDA ext path lowers to the same math under XLA)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import weight_reduce_loss


def sigmoid_focal_loss(pred, target, one_hot_target=None, weight=None,
                       gamma=2.0, alpha=0.5, class_weight=None,
                       valid_mask=None, reduction='mean', avg_factor=None):
    """Elementwise sigmoid focal loss (reference ``focal_loss.py:13``).

    pred (N, ..., C) logits; target same-shape one-hot (float).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if isinstance(alpha, (list, tuple)):
        # per-class alpha (reference ``focal_loss.py:106-118`` routes a list
        # alpha through the final weight with alpha=0.5 ×2 inside the pow —
        # algebraically identical to applying the per-class vector directly,
        # since alpha enters the focal weight linearly). Channel axis is
        # last, so a 1-D vector broadcasts per class.
        alpha = jnp.asarray(alpha, jnp.float32)
    pred_sigmoid = jax.nn.sigmoid(pred)
    one_minus_pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * \
        one_minus_pt ** gamma
    # bce with logits, elementwise
    bce = jnp.maximum(pred, 0) - pred * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_weight
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    if valid_mask is not None:
        loss = loss * valid_mask
    final_weight = jnp.ones((1,) * loss.ndim, jnp.float32)
    if weight is not None:
        weight = jnp.asarray(weight, jnp.float32)
        if weight.ndim < loss.ndim:
            weight = weight[..., None]
        final_weight = final_weight * weight
    if valid_mask is not None:
        final_weight = final_weight * valid_mask
    return weight_reduce_loss(loss, None if final_weight.ndim == loss.ndim
                              and (weight is None and valid_mask is None)
                              else jnp.broadcast_to(final_weight, loss.shape),
                              reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    """Focal loss (reference ``focal_loss.py:137``); sigmoid only."""

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.5,
                 reduction='mean', class_weight=None, loss_weight=1.0,
                 loss_name='loss_focal'):
        # constructor contract ≙ reference ``focal_loss.py:176-190``
        assert use_sigmoid is True, 'only sigmoid focal loss is supported'
        assert reduction in ('none', 'mean', 'sum'), \
            "reduction should be 'none', 'mean' or 'sum'"
        assert isinstance(alpha, (float, list)), \
            'alpha should be of type float'
        assert isinstance(gamma, float), 'gamma should be of type float'
        assert isinstance(loss_weight, float), \
            'loss_weight should be of type float'
        assert isinstance(loss_name, str), 'loss_name should be of type str'
        assert isinstance(class_weight, list) or class_weight is None, \
            'class_weight must be None or of type list'
        self.use_sigmoid = use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        # forward contract ≙ reference ``focal_loss.py:230-240`` (NHWC:
        # class axis last, so the spatial-shape check compares
        # pred[1:-1] vs target[1:])
        assert isinstance(ignore_index, int), \
            'ignore_index must be of type int'
        assert reduction_override in (None, 'none', 'mean', 'sum')
        assert pred.shape == target.shape or \
            (pred.shape[0] == target.shape[0] and
             tuple(pred.shape[1:-1]) == tuple(target.shape[1:])), \
            "The shape of pred doesn't match the shape of target"
        if self.use_sigmoid is not True:
            raise NotImplementedError(
                'only sigmoid focal loss is supported')
        reduction = reduction_override if reduction_override \
            else self.reduction
        num_classes = pred.shape[-1]
        if target.ndim == pred.ndim - 1:
            valid_mask = (target != ignore_index)
            safe = jnp.where(valid_mask, target, 0).astype(jnp.int32)
            if num_classes == 1:
                one_hot = (safe == 1).astype(jnp.float32)[..., None]
                valid = valid_mask[..., None].astype(jnp.float32)
            else:
                one_hot = jax.nn.one_hot(safe, num_classes,
                                         dtype=jnp.float32)
                one_hot = one_hot * valid_mask[..., None]
                valid = jnp.broadcast_to(
                    valid_mask[..., None], pred.shape).astype(jnp.float32)
        else:
            one_hot = target.astype(jnp.float32)
            valid = None
        loss = sigmoid_focal_loss(
            pred, one_hot, weight=weight, gamma=self.gamma,
            alpha=self.alpha, class_weight=self.class_weight,
            valid_mask=valid, reduction=reduction, avg_factor=avg_factor)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
