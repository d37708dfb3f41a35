"""Model registries + build functions (≙ reference ``mmseg/models/builder.py``).

Registered classes are flax.linen Modules (backbones/necks/heads/segmentors)
or plain loss callables; ``build_*`` instantiates from an mmcv-style cfg dict
keyed on ``type``.
"""
from __future__ import annotations

from stc_unet_tpu.utils import Registry

BACKBONES = Registry('backbone')
NECKS = Registry('neck')
HEADS = Registry('head')
LOSSES = Registry('loss')
SEGMENTORS = Registry('segmentor')

MODELS = Registry('models')
ATTENTION = Registry('attention')


def build_backbone(cfg):
    """Build backbone (reference ``builder.py:20``)."""
    return BACKBONES.build(cfg)


def build_neck(cfg):
    return NECKS.build(cfg)


def build_head(cfg):
    return HEADS.build(cfg)


def build_loss(cfg):
    return LOSSES.build(cfg)


def build_segmentor(cfg, train_cfg=None, test_cfg=None):
    """Build segmentor (reference ``builder.py:38``).

    Returns a :class:`~stc_unet_tpu.models.segmentors.base.BaseSegmentor`
    wrapper holding the flax module plus train/test cfg.
    """
    cfg = dict(cfg)
    if train_cfg is not None or test_cfg is not None:
        assert cfg.get('train_cfg') is None and cfg.get('test_cfg') is None, \
            'train_cfg/test_cfg specified in both outer field and model field'
    cfg.setdefault('train_cfg', train_cfg)
    cfg.setdefault('test_cfg', test_cfg)
    return SEGMENTORS.build(cfg)
