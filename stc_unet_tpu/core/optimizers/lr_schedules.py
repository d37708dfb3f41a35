"""Learning-rate schedules (≙ mmcv ``LrUpdaterHook`` policies the reference
configures via ``lr_config``).

The reference mutates ``param_group['lr']`` from a hook each iteration; the
TPU-native design compiles the policy into the optimizer as a pure
``schedule(step) -> lr`` function (jit-traceable: jnp ops only, no python
branches on the step value).

Supported policies: ``poly`` (reference ``my_config/STC-UNet.py:91``),
``step``, ``fixed``, ``CosineAnnealing``, ``linear``; optional linear/constant
warmup with mmcv's ``warmup_iters``/``warmup_ratio`` semantics.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax.numpy as jnp


def build_lr_schedule(lr_config: Optional[dict], base_lr: float,
                      max_iters: int,
                      iters_per_epoch: int = 1) -> Callable:
    """Build ``schedule(step) -> lr`` from an mmcv-style lr_config.

    ``by_epoch=True`` policies quantize progress to epoch boundaries
    (mmcv updates the LR once per epoch); max progress is still derived
    from ``max_iters``.
    """
    if lr_config is None:
        return lambda step: base_lr
    cfg = dict(lr_config)
    policy = cfg.pop('policy', 'fixed')
    by_epoch = cfg.pop('by_epoch', True)
    warmup = cfg.pop('warmup', None)
    warmup_iters = cfg.pop('warmup_iters', 0)
    warmup_ratio = cfg.pop('warmup_ratio', 0.1)
    cfg.pop('warmup_by_epoch', None)

    max_epochs = max(max_iters // max(iters_per_epoch, 1), 1)

    def progress(step):
        """Fraction of training done in [0, 1]."""
        if by_epoch:
            epoch = step // iters_per_epoch
            return jnp.minimum(epoch / max_epochs, 1.0)
        return jnp.minimum(step / max(max_iters, 1), 1.0)

    if policy == 'fixed':
        def regular(step):
            return jnp.asarray(base_lr, jnp.float32)
    elif policy == 'poly':
        power = cfg.get('power', 1.0)
        min_lr = cfg.get('min_lr', 0.0)
        def regular(step):
            coeff = (1.0 - progress(step)) ** power
            return (base_lr - min_lr) * coeff + min_lr
    elif policy == 'step':
        gamma = cfg.get('gamma', 0.1)
        milestones = cfg.get('step')
        if isinstance(milestones, int):
            def regular(step):
                unit = (step // iters_per_epoch) if by_epoch else step
                return base_lr * gamma ** (unit // milestones)
        else:
            ms = jnp.asarray(list(milestones))
            def regular(step):
                unit = (step // iters_per_epoch) if by_epoch else step
                exp = jnp.sum(unit >= ms)
                return base_lr * gamma ** exp
    elif policy == 'CosineAnnealing':
        min_lr = cfg.get('min_lr', None)
        min_lr_ratio = cfg.get('min_lr_ratio', None)
        if min_lr is None:
            min_lr = base_lr * (min_lr_ratio or 0.0)
        def regular(step):
            cos_out = jnp.cos(jnp.pi * progress(step)) + 1.0
            return min_lr + 0.5 * (base_lr - min_lr) * cos_out
    elif policy == 'linear':
        min_lr = cfg.get('min_lr', 0.0)
        def regular(step):
            return base_lr + (min_lr - base_lr) * progress(step)
    else:
        raise KeyError(f'Unsupported lr policy: {policy}')

    if warmup is None or warmup_iters <= 0:
        return regular

    def schedule(step):
        lr = regular(step)
        k = jnp.minimum(step / warmup_iters, 1.0)
        if warmup == 'linear':
            factor = 1.0 - (1.0 - k) * (1.0 - warmup_ratio)
        elif warmup == 'constant':
            factor = jnp.where(step < warmup_iters, warmup_ratio, 1.0)
        elif warmup == 'exp':
            factor = warmup_ratio ** (1.0 - k)
        else:
            raise KeyError(f'Unsupported warmup type: {warmup}')
        return lr * jnp.where(step < warmup_iters, factor, 1.0)

    return schedule
