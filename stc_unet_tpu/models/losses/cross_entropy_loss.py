"""Cross-entropy losses (≙ reference ``losses/cross_entropy_loss.py:197``).

Class axis LAST: pred (N, ..., C), label int (N, ...). All math matches the
reference's mmseg semantics: ``reduction='none'`` elementwise CE with zeros
at ignored pixels, then :func:`weight_reduce_loss`; ``avg_non_ignore``
switches the mean denominator to the non-ignored count.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weight_reduce_loss


def cross_entropy(pred, label, weight=None, class_weight=None,
                  reduction='mean', avg_factor=None, ignore_index=-100,
                  avg_non_ignore=False):
    """Softmax CE (reference ``cross_entropy_loss.py:12``)."""
    valid = (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    # one-hot contraction, NOT take_along_axis: XLA:TPU lowers the latter
    # to a bitpacked per-pixel gather (30 ms/step on the 512² train step,
    # the single largest op in the profile); the multiply-reduce fuses
    # into the log_softmax stream for free. Same math.
    num_classes = logp.shape[-1]
    loss = -jnp.sum(
        logp * jax.nn.one_hot(safe, num_classes, dtype=logp.dtype), axis=-1)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        loss = loss * cw[safe]
    loss = jnp.where(valid, loss, 0.0)
    if (avg_factor is None) and avg_non_ignore and reduction == 'mean':
        avg_factor = jnp.sum(valid)
    if weight is not None:
        weight = weight.astype(jnp.float32)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction='mean',
                         avg_factor=None, class_weight=None,
                         ignore_index=-100, avg_non_ignore=False, **kwargs):
    """Sigmoid BCE-with-logits (reference ``cross_entropy_loss.py:89``).

    pred (N, ..., C) or (N, ..., 1); label int (N, ...) or float same-shape.
    """
    pred = pred.astype(jnp.float32)
    if pred.shape[-1] == 1:
        pred = pred[..., 0]
    if pred.ndim != label.ndim:
        # one-hot expand with validity masking (reference
        # ``_expand_onehot_labels``, cross_entropy_loss.py:66)
        num_classes = pred.shape[-1]
        valid = (label >= 0) & (label != ignore_index)
        safe = jnp.where(valid, label, 0).astype(jnp.int32)
        onehot = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
        onehot = onehot * valid[..., None]
        if weight is None:
            weight = valid[..., None].astype(jnp.float32)
        else:
            weight = weight[..., None] * valid[..., None]
        label = onehot
        valid_mask = jnp.broadcast_to(valid[..., None], pred.shape)
    else:
        valid_mask = ((label >= 0) & (label != ignore_index))
        if weight is not None:
            weight = weight * valid_mask
        else:
            weight = valid_mask.astype(jnp.float32)
        label = label.astype(jnp.float32)
    if reduction == 'mean' and avg_factor is None and avg_non_ignore:
        avg_factor = jnp.sum(valid_mask)
    # BCE with logits, elementwise; pos_weight == class_weight semantics
    logp = jax.nn.log_sigmoid(pred)
    lognp = jax.nn.log_sigmoid(-pred)
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)
        loss = -(cw * label * logp + (1 - label) * lognp)
    else:
        loss = -(label * logp + (1 - label) * lognp)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mask_cross_entropy(pred, target, label, reduction='mean',
                       avg_factor=None, class_weight=None, ignore_index=None,
                       **kwargs):
    """Per-ROI mask BCE (reference ``cross_entropy_loss.py:157``): select
    each ROI's class-``label`` mask channel from pred (N, H, W, C) or (N, C)
    and BCE it against ``target``. Returns a length-1 array like the
    reference's ``[None]`` expansion."""
    assert ignore_index is None, 'BCE loss does not support ignore_index'
    assert reduction == 'mean' and avg_factor is None
    pred = pred.astype(jnp.float32)
    label = jnp.asarray(label).astype(jnp.int32)
    pred_slice = jnp.take_along_axis(
        pred, label.reshape(label.shape[0], *([1] * (pred.ndim - 1))),
        axis=-1)[..., 0]
    target = jnp.asarray(target, jnp.float32)
    loss = jnp.maximum(pred_slice, 0) - pred_slice * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred_slice)))
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    return jnp.mean(loss)[None]


@LOSSES.register_module()
class CrossEntropyLoss:
    """CE / BCE loss with mmseg semantics (reference ``:197``).

    A plain callable (no parameters); ``loss_name`` keys the loss dict and
    gradient participation (``loss_`` prefix).
    """


    def __init__(self, use_sigmoid=False, use_mask=False, reduction='mean',
                 class_weight=None, loss_weight=1.0, loss_name='loss_ce',
                 avg_non_ignore=False):
        assert (use_sigmoid is False) or (use_mask is False)
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = get_class_weight(class_weight)
        self.avg_non_ignore = avg_non_ignore
        if self.use_sigmoid:
            self.cls_criterion = binary_cross_entropy
        elif self.use_mask:
            self.cls_criterion = mask_cross_entropy
        else:
            self.cls_criterion = cross_entropy
        self._loss_name = loss_name

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=-100, **kwargs):
        assert reduction_override in (None, 'none', 'mean', 'sum')
        reduction = reduction_override if reduction_override else self.reduction
        return self.loss_weight * self.cls_criterion(
            cls_score, label, weight, class_weight=self.class_weight,
            reduction=reduction, avg_factor=avg_factor,
            avg_non_ignore=self.avg_non_ignore, ignore_index=ignore_index,
            **kwargs)

    @property
    def loss_name(self):
        return self._loss_name
