"""API tests (≙ reference tests/test_apis): single_gpu_test over a real
loader + init/inference segmentor round trip."""
import os

import numpy as np
import pytest
from PIL import Image

from stc_unet_tpu.apis import (inference_segmentor, init_segmentor,
                               single_gpu_test)
from stc_unet_tpu.datasets import build_dataloader, build_dataset
from stc_unet_tpu.engine import save_checkpoint
from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config

MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=dict(type='CrossEntropyLoss')))

TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=False),
             dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
                  to_rgb=True),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]


@pytest.fixture(scope='module')
def tiny_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('api_data')
    rng = np.random.RandomState(0)
    for sub in ['imgs', 'anns']:
        os.makedirs(root / sub, exist_ok=True)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3),
                                    dtype=np.uint8)).save(
            root / 'imgs' / f'{i}.png')
        Image.fromarray(rng.randint(0, 2, (32, 32)).astype(np.uint8)).save(
            root / 'anns' / f'{i}.png')
    return str(root)


def test_single_gpu_test_pre_eval(tiny_root):
    ds = build_dataset(dict(type='MyDataset', data_root=tiny_root,
                            img_dir='imgs', ann_dir='anns',
                            pipeline=TEST_PIPELINE, test_mode=True))
    loader = build_dataloader(ds, samples_per_gpu=1, workers_per_gpu=0,
                              dist=False, shuffle=False)
    model = build_segmentor(MODEL, test_cfg=dict(mode='whole'))
    model.init_weights(seed=0)
    results = single_gpu_test(model, loader, pre_eval=True)
    assert len(results) == 3
    metrics = ds.evaluate(results, metric='mIoU')
    assert 'mIoU' in metrics


def test_single_gpu_test_raw_and_format(tiny_root, tmp_path):
    ds = build_dataset(dict(type='MyDataset', data_root=tiny_root,
                            img_dir='imgs', ann_dir='anns',
                            pipeline=TEST_PIPELINE, test_mode=True))
    loader = build_dataloader(ds, samples_per_gpu=1, workers_per_gpu=0,
                              dist=False, shuffle=False)
    model = build_segmentor(MODEL, test_cfg=dict(mode='whole'))
    model.init_weights(seed=0)
    results = single_gpu_test(model, loader)
    assert len(results) == 3 and results[0].shape == (32, 32)
    files = single_gpu_test(
        model, loader, format_only=True,
        format_args=dict(imgfile_prefix=str(tmp_path / 'fmt')))
    assert all(os.path.exists(f) for f in files)


def test_init_and_inference_roundtrip(tiny_root, tmp_path):
    cfg = Config(dict(model=MODEL, test_cfg=dict(mode='whole'),
                      data=dict(test=dict(pipeline=TEST_PIPELINE))))
    model = build_segmentor(cfg.model, test_cfg=cfg.test_cfg)
    variables = model.init_weights(seed=0)
    ckpt = str(tmp_path / 'm.ckpt')
    save_checkpoint(ckpt, variables,
                    meta=dict(CLASSES=['background', 'target'],
                              PALETTE=[[0, 0, 0], [1, 1, 1]]))
    model2 = init_segmentor(cfg, ckpt)
    assert model2.CLASSES == ('background', 'target')
    img_path = os.path.join(tiny_root, 'imgs', '0.png')
    res = inference_segmentor(model2, img_path)
    assert res[0].shape == (32, 32)
    # array input and visualization
    import cv2
    res2 = inference_segmentor(model2, cv2.imread(img_path))
    np.testing.assert_array_equal(np.asarray(res[0]), np.asarray(res2[0]))
    out = model2.show_result(img_path, res, opacity=0.5)
    assert out.shape == (32, 32, 3)


def test_inference_segmentor_with_flip_tta(tiny_root, tmp_path):
    """MultiScaleFlipAug flip=True path through the public inference API
    (reference inference.py:70 + aug_test averaging)."""
    from stc_unet_tpu.utils import Config
    cfg = Config(dict(
        model=dict(MODEL),
        data=dict(test=dict(
            type='MyDataset', data_root=tiny_root, img_dir='imgs',
            ann_dir='anns', test_mode=True,
            pipeline=[
                dict(type='LoadImageFromFile'),
                dict(type='MultiScaleFlipAug', img_scale=(32, 32),
                     flip=True, flip_direction=['horizontal'],
                     transforms=[
                         dict(type='Resize', keep_ratio=False),
                         dict(type='RandomFlip'),
                         dict(type='Normalize', mean=[0, 0, 0],
                              std=[255, 255, 255], to_rgb=True),
                         dict(type='ImageToTensor', keys=['img']),
                         dict(type='Collect', keys=['img'])])]))))
    model = init_segmentor(cfg)
    result = inference_segmentor(model, os.path.join(tiny_root, 'imgs',
                                                     '0.png'))
    assert np.asarray(result[0]).shape == (32, 32)


def test_show_result_pyplot_writes_file(tiny_root, tmp_path):
    from stc_unet_tpu.apis import show_result_pyplot
    from stc_unet_tpu.models import build_segmentor
    model = build_segmentor(MODEL, test_cfg=dict(mode='whole'))
    model.init_weights(seed=0)
    model.PALETTE = [[0, 0, 0], [255, 0, 0]]
    img = np.zeros((32, 32, 3), np.uint8)
    seg = np.zeros((32, 32), np.int64)
    out = str(tmp_path / 'vis.png')
    show_result_pyplot(model, img, [seg], out_file=out, block=False)
    assert os.path.exists(out)


def test_checkpoint_hook_max_keep(tmp_path):
    """max_keep_ckpts prunes old epoch checkpoints (mmcv semantics) —
    exercised through the real BaseRunner.save_checkpoint."""
    import logging
    from stc_unet_tpu.engine.runner import BaseRunner

    class _Runner:
        work_dir = str(tmp_path)
        meta = None
        logger = logging.getLogger('test')
        epoch = 0
        iter = 0

        class state:
            variables = {'params': {'w': np.zeros(1)}}
            opt_state = None
            step = 0

        class model:
            CLASSES = None
            PALETTE = None
    runner = _Runner()
    for ep in range(4):
        runner.epoch = ep
        BaseRunner.save_checkpoint(runner, str(tmp_path), by_epoch=True,
                                   save_optimizer=False, max_keep_ckpts=2)
    ckpts = sorted(f for f in os.listdir(tmp_path) if f.startswith('epoch'))
    assert ckpts == ['epoch_3.ckpt', 'epoch_4.ckpt'], ckpts
