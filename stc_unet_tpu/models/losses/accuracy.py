"""Pixel accuracy (≙ reference ``mmseg/models/losses/accuracy.py:6``).

Class axis LAST: pred (N, ..., C), target (N, ...).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import EPS


def accuracy(pred, target, topk=1, thresh=None, ignore_index=None):
    """Top-k pixel accuracy in percent, masking ``ignore_index``.

    Unlike the reference (which boolean-indexes out ignored pixels — a
    dynamic shape), we mask multiplicatively so the op jits with static
    shapes.
    """
    assert isinstance(topk, (int, tuple))
    return_single = isinstance(topk, int)
    topks = (topk,) if return_single else topk
    maxk = max(topks)
    assert pred.ndim == target.ndim + 1
    assert pred.shape[0] == target.shape[0]
    num_classes = pred.shape[-1]
    assert maxk <= num_classes

    if maxk == 1:
        pred_value = jnp.max(pred, axis=-1, keepdims=True)
        pred_label = jnp.argmax(pred, axis=-1)[..., None]
    else:
        pred_value, pred_label = jax.lax.top_k(pred, maxk)
    correct = pred_label == target[..., None]
    if thresh is not None:
        correct = correct & (pred_value > thresh)
    if ignore_index is not None:
        valid = (target != ignore_index)[..., None]
        correct = correct & valid
        total = jnp.sum(target != ignore_index) + EPS
    else:
        total = target.size + EPS
    res = []
    for k in topks:
        correct_k = jnp.sum(correct[..., :k].astype(jnp.float32)) + EPS
        res.append(correct_k * (100.0 / total))
    return res[0] if return_single else res


class Accuracy:
    """Callable wrapper with fixed topk/thresh/ignore_index
    (≙ reference ``losses/accuracy.py`` ``Accuracy(nn.Module)``)."""

    def __init__(self, topk=(1,), thresh=None, ignore_index=None):
        self.topk = topk
        self.thresh = thresh
        self.ignore_index = ignore_index

    def __call__(self, pred, target):
        return accuracy(pred, target, self.topk, self.thresh,
                        self.ignore_index)
