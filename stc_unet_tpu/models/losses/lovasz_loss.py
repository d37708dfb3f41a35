"""Lovász-Softmax / hinge loss (≙ reference ``losses/lovasz_loss.py``).

Static-shape jax formulation: ignored pixels are masked to zero error and
zero ground truth, so they sort to the tail and contribute nothing to the
Lovász extension dot-product — no dynamic boolean indexing required.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weight_reduce_loss


def lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension (reference ``lovasz_loss.py:15``)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard = jnp.concatenate(
            [jaccard[:1], jaccard[1:] - jaccard[:-1]], 0)
    return jaccard


def _flat_hinge(logits, labels, valid):
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors = jnp.where(valid, errors, -1e9)  # invalid → sorts last, relu→0
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    gt_sorted = jnp.where(valid, labels, 0.0)[order]
    grad = lovasz_grad(gt_sorted)
    return jnp.dot(nn_relu(errors_sorted), grad)


def nn_relu(x):
    return jnp.maximum(x, 0.0)


def lovasz_hinge(logits, labels, classes='present', per_image=False,
                 class_weight=None, reduction='mean', avg_factor=None,
                 ignore_index=255):
    """Binary Lovász hinge (reference ``lovasz_loss.py:84``).

    logits (N, H, W) raw scores; labels (N, H, W) {0, 1}.
    """
    valid = labels != ignore_index
    labels_f = labels.astype(jnp.float32)
    if per_image:
        losses = jax.vmap(
            lambda lo, la, va: _flat_hinge(lo.reshape(-1), la.reshape(-1),
                                           va.reshape(-1)))(
            logits, labels_f, valid)
        return weight_reduce_loss(losses, None, reduction, avg_factor)
    return _flat_hinge(logits.reshape(-1), labels_f.reshape(-1),
                       valid.reshape(-1))


def _flat_softmax(probs, labels, valid, classes, class_weight):
    """probs (P, C); labels (P,) int; valid (P,) bool."""
    num_classes = probs.shape[1]
    labels = jnp.where(valid, labels, 0)
    losses = []
    weights = []
    # reference lovasz_softmax_flat: classes may be 'all'/'present' or an
    # explicit class-id list restricting the average
    class_to_sum = (list(classes) if isinstance(classes, (list, tuple))
                    else range(num_classes))
    for c in class_to_sum:
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.abs(fg - probs[:, c])
        errors = jnp.where(valid, errors, 0.0)  # tail, zero contribution
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        loss_c = jnp.dot(errors_sorted, lovasz_grad(fg_sorted))
        if class_weight is not None:
            loss_c = loss_c * class_weight[c]
        if classes == 'present':
            present = (jnp.sum(fg) > 0).astype(jnp.float32)
            losses.append(loss_c * present)
            weights.append(present)
        else:
            losses.append(loss_c)
            weights.append(jnp.asarray(1.0))
    total = sum(losses)
    count = sum(weights)
    return total / jnp.maximum(count, 1.0)


def lovasz_softmax(probs, labels, classes='present', per_image=False,
                   class_weight=None, reduction='mean', avg_factor=None,
                   ignore_index=255):
    """Multi-class Lovász-Softmax (reference ``lovasz_loss.py:172``).

    probs (N, H, W, C) softmax probabilities; labels (N, H, W) int.
    """
    valid = labels != ignore_index
    n, h, w, c = probs.shape
    if per_image:
        losses = jax.vmap(
            lambda p, la, va: _flat_softmax(p.reshape(-1, c),
                                            la.reshape(-1), va.reshape(-1),
                                            classes, class_weight))(
            probs, labels, valid)
        return weight_reduce_loss(losses, None, reduction, avg_factor)
    return _flat_softmax(probs.reshape(-1, c), labels.reshape(-1),
                         valid.reshape(-1), classes, class_weight)


@LOSSES.register_module()
class LovaszLoss:
    """Lovász loss (reference ``lovasz_loss.py:226``)."""

    def __init__(self, loss_type='multi_class', classes='present',
                 per_image=False, reduction='mean', class_weight=None,
                 loss_weight=1.0, loss_name='loss_lovasz'):
        assert loss_type in ('binary', 'multi_class')
        if not per_image:
            assert reduction == 'none', \
                'reduction should be "none" when per_image is False.'
        self.cls_criterion = lovasz_hinge if loss_type == 'binary' \
            else lovasz_softmax
        self.classes = classes
        self.per_image = per_image
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = get_class_weight(class_weight)
        self._loss_name = loss_name

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        assert reduction_override in (None, 'none', 'mean', 'sum')
        reduction = reduction_override if reduction_override \
            else self.reduction
        class_weight = None
        if self.class_weight is not None:
            class_weight = jnp.asarray(self.class_weight, jnp.float32)
        if self.cls_criterion is lovasz_softmax:
            cls_score = jax.nn.softmax(cls_score.astype(jnp.float32),
                                       axis=-1)
        else:
            cls_score = cls_score.astype(jnp.float32)
            if cls_score.ndim == label.ndim + 1:
                cls_score = cls_score[..., 0]
        loss = self.cls_criterion(
            cls_score, label, classes=self.classes,
            per_image=self.per_image, class_weight=class_weight,
            reduction=reduction, avg_factor=avg_factor,
            ignore_index=ignore_index)
        return self.loss_weight * loss

    @property
    def loss_name(self):
        return self._loss_name
