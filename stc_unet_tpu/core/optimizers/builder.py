"""Optimizer construction (≙ reference ``mmseg/core/builder.py:11,22`` + mmcv
``DefaultOptimizerConstructor``), rebuilt on optax.

The reference's optimizer cfg vocabulary (``type='SGD'/'Adam'/'AdamW'``, lr,
momentum, betas, weight_decay, paramwise_cfg custom_keys) is kept; the result
is an ``optax.GradientTransformation`` whose learning rate follows a
``schedule(step) -> lr`` callable (the TPU-native replacement for mmcv's
LrUpdaterHook mutating ``param_group['lr']`` — under jit the schedule is
traced once and indexed by the step counter).

torch parity notes:
- SGD/Adam ``weight_decay`` is L2-into-gradient (decay added *before* the
  momentum/adam statistics), AdamW is decoupled (added after) — matching
  torch.optim semantics exactly.
- lr multiplies last in all torch optimizers, so per-step lr scheduling
  composes as a final ``scale_by_schedule``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Union

import jax
import optax

from stc_unet_tpu.utils import Registry

OPTIMIZERS = Registry('optimizer')
OPTIMIZER_BUILDERS = Registry('optimizer builder')

Schedule = Callable[[Any], Any]


def _scale_by_algorithm(cfg: dict) -> list:
    """Per-type gradient statistics chain (everything except lr and decay)."""
    opt_type = cfg['type']
    if opt_type == 'SGD':
        momentum = cfg.get('momentum', 0.0)
        nesterov = cfg.get('nesterov', False)
        chain = []
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=nesterov))
        return chain
    if opt_type in ('Adam', 'AdamW'):
        b1, b2 = cfg.get('betas', (0.9, 0.999))
        eps = cfg.get('eps', 1e-8)
        return [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
    if opt_type == 'RMSprop':
        alpha = cfg.get('alpha', 0.99)
        eps = cfg.get('eps', 1e-8)
        return [optax.scale_by_rms(decay=alpha, eps=eps)]
    if opt_type in OPTIMIZERS:
        # user-registered optimizer (≙ mmcv custom optimizers): the entry
        # provides the gradient-STATISTICS transformation only — lr
        # scheduling, weight decay and paramwise masks stay the
        # framework's, so custom optimizers compose with lr_config /
        # paramwise_cfg like the built-ins. The registered class/function
        # receives the cfg kwargs minus the framework-owned keys and must
        # return (or expose as ``.tx``) an optax.GradientTransformation.
        kwargs = {k: v for k, v in cfg.items()
                  if k not in ('type', 'lr', 'weight_decay')}
        obj = OPTIMIZERS.get(opt_type)(**kwargs)
        tx = getattr(obj, 'tx', obj)
        if not isinstance(tx, optax.GradientTransformation):
            raise TypeError(
                f'registered optimizer {opt_type!r} must provide an '
                f'optax.GradientTransformation (got {type(tx).__name__})')
        return [tx]
    raise KeyError(f'Unsupported optimizer type: {opt_type}')


def _is_norm_or_bias(path) -> Dict[str, bool]:
    keys = [getattr(k, 'key', getattr(k, 'name', str(k))) for k in path]
    name = keys[-1] if keys else ''
    is_bias = name == 'bias'
    is_norm = any(str(k).startswith(('bn', 'gn', 'ln', 'norm')) or
                  'batch_stats' in str(k) for k in keys) or name == 'scale'
    return {'bias': is_bias, 'norm': is_norm}


def _paramwise_masks(params, paramwise_cfg: dict, base_wd: float):
    """Compute per-leaf (lr_mult, decay_mult) from mmcv paramwise_cfg.

    Supports ``custom_keys`` (substring match on the joined param path, the
    longest match wins — mmcv rule), ``norm_decay_mult`` and
    ``bias_decay_mult``.
    """
    custom_keys = paramwise_cfg.get('custom_keys', {})
    sorted_keys = sorted(custom_keys.keys(), key=len, reverse=True)
    norm_decay_mult = paramwise_cfg.get('norm_decay_mult', 1.0)
    bias_decay_mult = paramwise_cfg.get('bias_decay_mult', 1.0)

    def leaf_mults(path, _leaf):
        joined = '.'.join(
            str(getattr(k, 'key', getattr(k, 'name', k))) for k in path)
        lr_mult, decay_mult = 1.0, 1.0
        matched = False
        for key in sorted_keys:
            if key in joined:
                lr_mult = custom_keys[key].get('lr_mult', 1.0)
                decay_mult = custom_keys[key].get('decay_mult', 1.0)
                matched = True
                break
        if not matched:
            flags = _is_norm_or_bias(path)
            if flags['norm']:
                decay_mult = norm_decay_mult
            elif flags['bias']:
                decay_mult = bias_decay_mult
        return (lr_mult, decay_mult)

    mults = jax.tree_util.tree_map_with_path(leaf_mults, params)
    lr_mults = jax.tree_util.tree_map(lambda m: m[0], mults,
                                      is_leaf=lambda x: isinstance(x, tuple))
    decay_mults = jax.tree_util.tree_map(lambda m: m[1], mults,
                                         is_leaf=lambda x: isinstance(x, tuple))
    return lr_mults, decay_mults


def _scale_leafwise(mults):
    """Multiply each update leaf by its static multiplier."""
    def update_fn(updates, state, params=None):
        del params
        new = jax.tree_util.tree_map(lambda u, m: u * m, updates, mults)
        return new, state
    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def _add_decayed_weights_leafwise(base_wd, decay_mults):
    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError('params required for weight decay')
        new = jax.tree_util.tree_map(
            lambda u, p, m: u + base_wd * m * p, updates, params, decay_mults)
        return new, state
    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def build_optimizer_tx(cfg: dict,
                       schedule: Optional[Schedule] = None,
                       params=None) -> optax.GradientTransformation:
    """Build the optax transformation for an mmcv-style optimizer cfg.

    Args:
        cfg: e.g. ``dict(type='Adam', lr=1e-5, betas=(0.9, 0.999))``
            (reference ``my_config/STC-UNet.py:88``), optionally with
            ``paramwise_cfg``.
        schedule: ``step -> lr``; defaults to constant ``cfg['lr']``.
        params: param pytree — required only when paramwise_cfg is used.
    """
    cfg = dict(cfg)
    constructor = cfg.pop('constructor', 'DefaultOptimizerConstructor')
    if constructor in ('LearningRateDecayOptimizerConstructor',
                       'LayerDecayOptimizerConstructor'):
        from .layer_decay import (LayerDecayOptimizerConstructor,
                                  LearningRateDecayOptimizerConstructor)
        klass = (LearningRateDecayOptimizerConstructor
                 if constructor == 'LearningRateDecayOptimizerConstructor'
                 else LayerDecayOptimizerConstructor)
        if params is None:
            raise ValueError(f'{constructor} requires the params pytree')
        paramwise_cfg = cfg.pop('paramwise_cfg', None) or {}
        return klass(cfg, paramwise_cfg)(params, schedule=schedule)
    if constructor != 'DefaultOptimizerConstructor':
        raise NotImplementedError(
            f'optimizer constructor {constructor} not supported yet')
    paramwise_cfg = cfg.pop('paramwise_cfg', None) or {}
    base_lr = cfg['lr']
    wd = cfg.get('weight_decay', 0.0)
    opt_type = cfg['type']
    if schedule is None:
        schedule = lambda step: base_lr  # noqa: E731

    chain = []
    lr_mults = decay_mults = None
    if paramwise_cfg:
        if params is None:
            raise ValueError('paramwise_cfg requires the params pytree')
        lr_mults, decay_mults = _paramwise_masks(params, paramwise_cfg, wd)

    # coupled L2 (SGD/Adam/RMSprop): decay folds into the gradient first
    if wd and opt_type != 'AdamW':
        if decay_mults is not None:
            chain.append(_add_decayed_weights_leafwise(wd, decay_mults))
        else:
            chain.append(optax.add_decayed_weights(wd))
    chain.extend(_scale_by_algorithm(cfg))
    # decoupled decay (AdamW): after the adam statistics, scaled by lr
    if wd and opt_type == 'AdamW':
        if decay_mults is not None:
            chain.append(_add_decayed_weights_leafwise(wd, decay_mults))
        else:
            chain.append(optax.add_decayed_weights(wd))
    if lr_mults is not None:
        chain.append(_scale_leafwise(lr_mults))
    chain.append(optax.scale_by_schedule(lambda step: -schedule(step)))
    return optax.chain(*chain)


def build_optimizer(model_or_params, cfg: dict,
                    schedule: Optional[Schedule] = None):
    """API-parity wrapper (reference ``core/builder.py:22``).

    Accepts either a segmentor wrapper (uses its ``variables['params']``) or
    a raw param pytree.
    """
    params = model_or_params
    if hasattr(model_or_params, 'variables'):
        v = model_or_params.variables
        params = v.get('params') if isinstance(v, dict) else None
    return build_optimizer_tx(cfg, schedule=schedule, params=params)


def build_optimizer_constructor(cfg: dict):
    """≙ reference ``core/builder.py`` ``build_optimizer_constructor``:
    resolve a constructor cfg (``type`` + optimizer/paramwise cfgs) to a
    ready-to-call constructor instance."""
    cfg = dict(cfg)
    ctype = cfg.pop('type')
    from .layer_decay import (LayerDecayOptimizerConstructor,
                              LearningRateDecayOptimizerConstructor)
    table = {
        'LearningRateDecayOptimizerConstructor':
            LearningRateDecayOptimizerConstructor,
        'LayerDecayOptimizerConstructor': LayerDecayOptimizerConstructor,
    }
    if ctype == 'DefaultOptimizerConstructor':
        optimizer_cfg = cfg.get('optimizer_cfg', {})
        paramwise_cfg = cfg.get('paramwise_cfg', None)

        def default_ctor(params, schedule=None):
            merged = dict(optimizer_cfg)
            if paramwise_cfg:
                merged['paramwise_cfg'] = paramwise_cfg
            return build_optimizer_tx(merged, schedule=schedule,
                                      params=params)
        return default_ctor
    if ctype not in table:
        raise KeyError(f'unknown optimizer constructor {ctype}')
    return table[ctype](cfg.get('optimizer_cfg', {}),
                        cfg.get('paramwise_cfg', None))
