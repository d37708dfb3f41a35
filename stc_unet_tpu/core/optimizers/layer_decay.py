"""Layer-wise learning-rate decay (≙ reference
``core/optimizers/layer_decay_optimizer_constructor.py:103,189``).

ConvNeXt/BEiT/ViT fine-tuning: parameters get lr multipliers that decay
geometrically with depth, and norms/biases skip weight decay. Expressed here
as a pure function producing per-leaf (lr_mult, decay_mult) trees consumed
by :func:`~stc_unet_tpu.core.optimizers.builder.build_optimizer_tx` via
``paramwise_cfg`` — the functional equivalent of mmcv's param groups.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax


def get_layer_id_for_vit(var_name: str, max_layer_id: int) -> int:
    """Layer id of a ViT/BEiT parameter path (reference ``:164``)."""
    if any(k in var_name for k in ('cls_token', 'pos_embed', 'patch_embed')):
        return 0
    m = re.search(r'layers?[._](\d+)', var_name)
    if m and 'backbone' in var_name:
        return int(m.group(1)) + 1
    return max_layer_id - 1


def get_layer_id_for_convnext(var_name: str, max_layer_id: int) -> int:
    """Layer id of a ConvNeXt parameter path (reference ``:24``)."""
    if 'stem' in var_name or 'downsample_layers' in var_name:
        return 0
    m = re.search(r'stages?[._](\d+)[._](\d+)', var_name)
    if m:
        stage, block = int(m.group(1)), int(m.group(2))
        if stage == 0:
            return 1
        if stage == 1:
            return 2
        if stage == 2:
            return 3 + block // 3
        return max_layer_id - 1
    return max_layer_id - 1


def layer_decay_multipliers(params, num_layers: int = 12,
                            decay_rate: float = 0.9,
                            decay_type: str = 'layer_wise',
                            model_kind: str = 'vit'):
    """Per-leaf (lr_mult, decay_mult) pytrees for layer-wise LR decay."""
    if model_kind not in ('convnext', 'vit', 'beit', 'mae'):
        # ≙ reference ``layer_decay_optimizer_constructor.py`` add_params:
        # only ConvNeXt/BEiT/MAE backbones have layer-id rules; anything
        # else raises (tests/test_core/
        # test_layer_decay_optimizer_constructor.py:243-250)
        raise NotImplementedError(
            f'layer-wise LR decay is not supported for {model_kind!r} '
            "backbones (supported: 'convnext', 'beit'/'mae'/'vit'-style)")
    get_id = get_layer_id_for_convnext if model_kind == 'convnext' \
        else get_layer_id_for_vit
    max_id = num_layers + 2

    def leaf(path, _x):
        name = '.'.join(str(getattr(p, 'key', getattr(p, 'name', p)))
                        for p in path)
        if decay_type == 'layer_wise':
            layer_id = get_id(name, max_id)
        else:  # stage_wise
            layer_id = min(get_id(name, max_id), num_layers + 1)
        lr_mult = decay_rate ** (max_id - layer_id - 1)
        is_norm_or_bias = name.endswith(('bias', 'scale')) or \
            '.ln' in name or '.bn' in name or 'norm' in name or \
            'pos_embed' in name or 'cls_token' in name
        decay_mult = 0.0 if is_norm_or_bias else 1.0
        return (lr_mult, decay_mult)

    mults = jax.tree_util.tree_map_with_path(leaf, params)
    lr = jax.tree_util.tree_map(lambda m: m[0], mults,
                                is_leaf=lambda x: isinstance(x, tuple))
    wd = jax.tree_util.tree_map(lambda m: m[1], mults,
                                is_leaf=lambda x: isinstance(x, tuple))
    return lr, wd


class LearningRateDecayOptimizerConstructor:
    """API-parity class (reference ``:103``): builds an optax tx whose
    update applies layer-decayed lr and selective weight decay."""

    def __init__(self, optimizer_cfg: dict, paramwise_cfg: dict):
        self.optimizer_cfg = dict(optimizer_cfg)
        self.paramwise_cfg = dict(paramwise_cfg or {})

    def __call__(self, params, schedule=None):
        import optax
        from .builder import (_scale_by_algorithm, _scale_leafwise,
                              _add_decayed_weights_leafwise)
        cfg = dict(self.optimizer_cfg)
        num_layers = self.paramwise_cfg.get('num_layers', 12)
        decay_rate = self.paramwise_cfg.get('decay_rate', 0.9)
        decay_type = self.paramwise_cfg.get('decay_type', 'layer_wise')
        model_kind = self.paramwise_cfg.get('model_kind', 'vit')
        lr_mults, wd_mults = layer_decay_multipliers(
            params, num_layers, decay_rate, decay_type, model_kind)
        base_lr = cfg['lr']
        wd = cfg.get('weight_decay', 0.0)
        if schedule is None:
            schedule = lambda step: base_lr  # noqa: E731
        chain = []
        chain.extend(_scale_by_algorithm(cfg))
        if wd:
            chain.append(_add_decayed_weights_leafwise(wd, wd_mults))
        chain.append(_scale_leafwise(lr_mults))
        chain.append(optax.scale_by_schedule(lambda s: -schedule(s)))
        return optax.chain(*chain)


class LayerDecayOptimizerConstructor(LearningRateDecayOptimizerConstructor):
    """BEiT-style alias (reference ``:189``); ``layer_decay_rate`` key."""

    def __init__(self, optimizer_cfg, paramwise_cfg):
        paramwise_cfg = dict(paramwise_cfg or {})
        if 'layer_decay_rate' in paramwise_cfg:
            paramwise_cfg['decay_rate'] = paramwise_cfg.pop(
                'layer_decay_rate')
        super().__init__(optimizer_cfg, paramwise_cfg)
