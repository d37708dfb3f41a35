"""MultiScaleFlipAug + dataset-builder + eval/core negative-path contracts.

Reference anchors:
- tests/test_data/test_tta.py:13-40,153-165
- tests/test_data/test_dataset_builder.py:106-135
- tests/test_eval_hook.py:43-51
- tests/test_core/test_layer_decay_optimizer_constructor.py:243-250
- tests/test_core/test_optimizer.py:49-50
- tests/test_apis/test_single_gpu.py:67-73
"""
import os.path as osp

import pytest

from stc_unet_tpu.datasets import build_dataset
from stc_unet_tpu.datasets.builder import PIPELINES
from stc_unet_tpu.utils.registry import build_from_cfg

DATA = osp.join(osp.dirname(__file__), '..', 'fixtures')


def _tta(**kw):
    cfg = dict(type='MultiScaleFlipAug',
               transforms=[dict(type='Resize', keep_ratio=False)], **kw)
    return build_from_cfg(cfg, PIPELINES)


def test_tta_ctor_contracts():
    # img_scale=None needs float ratios (ref test_tta.py:13-20)
    with pytest.raises(AssertionError):
        _tta(img_scale=None, img_ratios=1)
    # img_scale=None, img_ratios=None (ref :23-30)
    with pytest.raises(AssertionError):
        _tta(img_scale=None, img_ratios=None)
    # ratios given with a scale must still be floats (ref :33-40)
    with pytest.raises(AssertionError):
        _tta(img_scale=(512, 512), img_ratios=1)
    # Pad before RandomFlip contradicts flip=True (ref :154-165)
    with pytest.raises(AssertionError):
        cfg = dict(
            type='MultiScaleFlipAug',
            img_scale=[(256, 256), (512, 512)],
            flip=True,
            transforms=[
                dict(type='Resize', keep_ratio=False),
                dict(type='Pad', size_divisor=32),
                dict(type='RandomFlip'),
            ])
        build_from_cfg(cfg, PIPELINES)
    # valid modes still build
    _tta(img_scale=None, img_ratios=[0.5, 1.0])
    _tta(img_scale=(512, 512), img_ratios=[0.5, 1.0, 2.0])
    _tta(img_scale=[(256, 256), (512, 512)])


def test_concat_dataset_count_contracts(tmp_path):
    import numpy as np
    from PIL import Image
    img_dir, ann_dir = 'images', 'labels'
    for sub in (img_dir, ann_dir):
        (tmp_path / sub).mkdir()
    for i in range(2):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / img_dir / f'{i}.png')
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(
            tmp_path / ann_dir / f'{i}.png')
    base = dict(type='CustomDataset', pipeline=[], data_root=str(tmp_path),
                img_suffix='.png', seg_map_suffix='.png')
    # len(ann_dir) should be zero or len(img_dir) (ref builder.py:47)
    with pytest.raises(AssertionError):
        build_dataset(dict(img_dir=[img_dir, img_dir],
                           ann_dir=[ann_dir, ann_dir, ann_dir], **base))
    # len(split) should be zero or len(img_dir) (ref builder.py:48)
    with pytest.raises(AssertionError):
        build_dataset(dict(img_dir=[img_dir, img_dir],
                           split=['s.txt', 's.txt', 's.txt'], **base))
    # single img_dir with multiple ann_dir needs matching split count
    # (ref builder.py:50)
    with pytest.raises(AssertionError):
        build_dataset(dict(img_dir=img_dir, ann_dir=[ann_dir, ann_dir],
                           split=['s.txt', 's.txt', 's.txt'], **base))
    # valid: parallel lists concat
    ds = build_dataset(dict(img_dir=[img_dir, img_dir],
                            ann_dir=[ann_dir, ann_dir], **base))
    assert len(ds) > 0


def test_eval_hook_requires_dataloader():
    from stc_unet_tpu.engine.eval_hooks import DistEvalHook, EvalHook
    with pytest.raises(TypeError):
        EvalHook([object()])          # a bare list is not a loader
    with pytest.raises(TypeError):
        DistEvalHook([object()])


def test_layer_decay_unsupported_backbone():
    from stc_unet_tpu.core.optimizers.layer_decay import (
        LearningRateDecayOptimizerConstructor)
    ctor = LearningRateDecayOptimizerConstructor(
        dict(type='AdamW', lr=1e-3, weight_decay=0.05),
        dict(num_layers=3, decay_rate=0.9, decay_type='layer_wise',
             model_kind='resnet'))
    with pytest.raises(NotImplementedError):
        ctor({'backbone': {'conv': {'kernel': None}}})


def test_unregistered_optimizer_constructor():
    from stc_unet_tpu.core import build_optimizer_constructor
    with pytest.raises(KeyError):
        build_optimizer_constructor(dict(type='A'))


def test_single_gpu_test_exclusive_flags():
    from stc_unet_tpu.apis import single_gpu_test
    with pytest.raises(AssertionError):
        single_gpu_test(object(), [], efficient_test=True, format_only=True,
                        pre_eval=True)
