"""Dataset + loader tests (≙ reference ``tests/test_data/test_dataset.py``)."""
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from stc_unet_tpu.datasets import (ConcatDataset, CustomDataset, DataLoader,
                                   EpochSampler, MyDataset, RepeatDataset,
                                   build_dataloader, build_dataset, collate)

TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(40, 40), keep_ratio=False),
    dict(type='RandomFlip', prob=0.5),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size=(40, 40), pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]

TEST_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug',
         img_scale=(40, 40),
         flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=False),
             dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1],
                  to_rgb=True),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ]),
]


@pytest.fixture(scope='module')
def kits_dir(tmp_path_factory):
    """A tiny KiTS19-layout dataset: train/images + train/labels pngs."""
    root = tmp_path_factory.mktemp('kits')
    rng = np.random.RandomState(0)
    for sub in ['train/images', 'train/labels']:
        os.makedirs(root / sub, exist_ok=True)
    for i in range(6):
        img = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        lbl = rng.randint(0, 2, (32, 32)).astype(np.uint8)
        Image.fromarray(img).save(root / 'train/images' / f'case_{i}.png')
        Image.fromarray(lbl).save(root / 'train/labels' / f'case_{i}.png')
    return str(root)


def test_my_dataset_train(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TRAIN_PIPELINE))
    assert len(ds) == 6
    assert ds.CLASSES == ('background', 'target')
    sample = ds[0]
    assert sample['img'].shape == (40, 40, 3)
    assert sample['img'].dtype == np.float32
    assert sample['gt_semantic_seg'].shape == (40, 40)
    assert sample['gt_semantic_seg'].dtype == np.int64
    assert 'ori_shape' in sample['img_metas']


def test_my_dataset_test_mode(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TEST_PIPELINE, test_mode=True))
    sample = ds[0]
    assert isinstance(sample['img'], list)
    assert sample['img'][0].shape == (40, 40, 3)
    assert isinstance(sample['img_metas'], list)


def test_pre_eval_and_evaluate(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TEST_PIPELINE, test_mode=True))
    # perfect predictions = the gt itself
    results = []
    for i in range(len(ds)):
        gt = ds.get_gt_seg_map_by_idx(i)
        results.extend(ds.pre_eval(gt, i))
    metrics = ds.evaluate(results, metric=['mIoU', 'mDice', 'mFscore'])
    assert np.isclose(metrics['mIoU'], 1.0)
    assert np.isclose(metrics['mDice'], 1.0)
    assert np.isclose(metrics['aAcc'], 1.0)
    assert 'IoU.target' in metrics


def test_evaluate_raw_results(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TEST_PIPELINE, test_mode=True))
    results = [ds.get_gt_seg_map_by_idx(i) for i in range(len(ds))]
    metrics = ds.evaluate(results, metric='mIoU')
    assert np.isclose(metrics['mIoU'], 1.0)


def test_format_results(kits_dir, tmp_path):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TEST_PIPELINE, test_mode=True))
    preds = [np.zeros((32, 32), np.uint8)]
    files = ds.format_results(preds, str(tmp_path / 'out'), indices=[0])
    assert osp.exists(files[0])


def test_wrappers(kits_dir):
    base = dict(type='MyDataset', data_root=kits_dir,
                img_dir='train/images', ann_dir='train/labels',
                pipeline=TRAIN_PIPELINE)
    rep = build_dataset(dict(type='RepeatDataset', times=3, dataset=base))
    assert len(rep) == 18
    cat = build_dataset([base, base])
    assert isinstance(cat, ConcatDataset)
    assert len(cat) == 12
    assert cat[7]['img'].shape == (40, 40, 3)


def test_custom_classes_label_map(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TRAIN_PIPELINE,
                            classes=['target']))
    assert ds.label_map == {0: 255, 1: 0}
    assert ds.CLASSES == ['target']


def test_split_file(kits_dir, tmp_path):
    split = tmp_path / 'split.txt'
    split.write_text('case_0\ncase_2\n')
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            split=str(split), pipeline=TRAIN_PIPELINE))
    assert len(ds) == 2


def test_collate_and_loader(kits_dir):
    ds = build_dataset(dict(type='MyDataset', data_root=kits_dir,
                            img_dir='train/images', ann_dir='train/labels',
                            pipeline=TRAIN_PIPELINE))
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=2,
                              shuffle=True, seed=0)
    batches = list(iter(loader))
    assert len(batches) == 3
    b = batches[0]
    assert b['img'].shape == (2, 40, 40, 3)
    assert b['gt_semantic_seg'].shape == (2, 40, 40)
    assert isinstance(b['img_metas'], list) and len(b['img_metas']) == 2


def test_epoch_sampler_determinism_and_sharding():
    s0 = EpochSampler(10, shuffle=True, seed=7, num_replicas=2, rank=0,
                      batch_size=2)
    s1 = EpochSampler(10, shuffle=True, seed=7, num_replicas=2, rank=1,
                      batch_size=2)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = s0.indices(), s1.indices()
    # disjoint-but-complete cover (padding may duplicate)
    assert len(i0) == len(i1)
    assert set(np.concatenate([i0, i1])) == set(range(10))
    # same epoch twice → identical
    np.testing.assert_array_equal(i0, s0.indices())
    s0.set_epoch(4)
    assert not np.array_equal(i0, s0.indices())
