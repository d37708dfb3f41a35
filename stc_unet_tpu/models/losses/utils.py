"""Loss reduction helpers (≙ reference ``mmseg/models/losses/utils.py``).

All functions are pure jnp; layouts are NHW(C) — class axis LAST (our NHWC
convention), unlike the reference's NCHW.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

EPS = float(np.finfo(np.float32).eps)


def get_class_weight(class_weight):
    """Load class weights (list | .npy path | None) — reference ``utils.py:10``."""
    if isinstance(class_weight, str):
        if class_weight.endswith('.npy'):
            class_weight = np.load(class_weight)
        else:
            import json
            with open(class_weight) as f:
                class_weight = json.load(f)
    return class_weight


def reduce_loss(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'invalid reduction: {reduction}')


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    """Apply element-wise weight then reduce (reference ``utils.py:48``).

    When ``avg_factor`` is given with reduction='mean', the loss is summed
    and divided by ``avg_factor + eps`` (traced-value safe: avg_factor may be
    a jnp scalar, e.g. the non-ignored pixel count).
    """
    if weight is not None:
        # shape contract ≙ reference ``utils.py:60-63`` (NHWC: the class
        # axis is last, so the per-class-broadcast check moves from axis 1
        # to axis -1)
        assert weight.ndim == loss.ndim
        if weight.ndim > 1:
            assert weight.shape[-1] == 1 or \
                weight.shape[-1] == loss.shape[-1]
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / (avg_factor + EPS)
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def weighted_loss(loss_func):
    """Decorator adding weight/reduction/avg_factor to an elementwise loss."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', avg_factor=None,
                **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper
