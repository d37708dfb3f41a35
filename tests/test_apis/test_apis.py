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
