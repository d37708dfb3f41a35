"""Decoded-image cache tests (`stc_unet_tpu/datasets/pipelines/img_cache.py`).

TPU-first addition (no reference counterpart): decode-once serving for
the loading transforms. The hazards these tests pin down: served arrays
must never alias cached storage (downstream transforms mutate in place),
stale files must re-decode, and the ``data.img_cache`` cfg flag must
reach the Load transforms through wrapper-dataset nesting.
"""
import os
import time

import numpy as np
import pytest
from PIL import Image

from stc_unet_tpu.datasets import build_dataset, inject_img_cache
from stc_unet_tpu.datasets.pipelines.img_cache import (DecodedImageCache,
                                                       build_img_cache,
                                                       clear_ram_cache)
from stc_unet_tpu.datasets.pipelines.loading import (LoadAnnotations,
                                                     LoadImageFromFile)


@pytest.fixture()
def png(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    path = str(tmp_path / 'img.png')
    Image.fromarray(arr).save(path)
    return path, arr


class CountingDecode:
    def __init__(self):
        self.calls = 0

    def __call__(self, path):
        self.calls += 1
        return np.array(Image.open(path))


@pytest.mark.parametrize('mode', ['ram', 'disk'])
def test_decode_once_and_no_aliasing(mode, png, tmp_path):
    path, arr = png
    clear_ram_cache()
    cache = DecodedImageCache(mode, cache_dir=str(tmp_path / 'c'))
    decode = CountingDecode()
    a = cache.get(path, decode)
    b = cache.get(path, decode)
    assert decode.calls == 1
    np.testing.assert_array_equal(a, arr)
    np.testing.assert_array_equal(a, b)
    # serves must be writable and independent of cached storage
    a[:] = 0
    c = cache.get(path, decode)
    np.testing.assert_array_equal(c, b)
    assert decode.calls == 1


def test_disk_cache_shared_across_instances(png, tmp_path):
    path, arr = png
    cdir = str(tmp_path / 'c')
    d1, d2 = CountingDecode(), CountingDecode()
    DecodedImageCache('disk', cache_dir=cdir).get(path, d1)
    out = DecodedImageCache('disk', cache_dir=cdir).get(path, d2)
    assert (d1.calls, d2.calls) == (1, 0)
    np.testing.assert_array_equal(out, arr)


def test_stale_file_reinvalidates(png, tmp_path):
    path, arr = png
    cdir = str(tmp_path / 'c')
    cache = DecodedImageCache('disk', cache_dir=cdir)
    decode = CountingDecode()
    cache.get(path, decode)
    new = (arr // 2).astype(np.uint8)
    time.sleep(0.01)  # ensure a distinct mtime_ns
    Image.fromarray(new).save(path)
    out = cache.get(path, decode)
    assert decode.calls == 2
    np.testing.assert_array_equal(out, new)


def test_corrupt_spool_entry_redecodes(png, tmp_path):
    path, _ = png
    cache = DecodedImageCache('disk', cache_dir=str(tmp_path / 'c'))
    decode = CountingDecode()
    first = cache.get(path, decode)
    npz = cache._disk_path(cache._entry_id(path))
    with open(npz, 'wb') as f:
        f.write(b'not an npz file')
    out = cache.get(path, decode)
    assert decode.calls == 2
    np.testing.assert_array_equal(out, first)


def test_stale_entries_are_overwritten_not_accumulated(png, tmp_path):
    """One entry per (file, params): an edited source re-decodes and
    REPLACES its entry in both modes (no unbounded stale growth)."""
    path, arr = png
    clear_ram_cache()
    cdir = str(tmp_path / 'c')
    disk = DecodedImageCache('disk', cache_dir=cdir)
    ram = DecodedImageCache('ram')
    decode = CountingDecode()
    disk.get(path, decode)
    ram.get(path, decode)
    for round_ in range(3):
        time.sleep(0.01)
        Image.fromarray((arr // (round_ + 2)).astype(np.uint8)).save(path)
        disk.get(path, decode)
        ram.get(path, decode)
    assert len(os.listdir(cdir)) == 1
    from stc_unet_tpu.datasets.pipelines.img_cache import _RAM_CACHE
    assert len(_RAM_CACHE) == 1


def test_param_tuple_separates_entries(png, tmp_path):
    path, _ = png
    cdir = str(tmp_path / 'c')
    gray = DecodedImageCache('disk', cdir, params=('gray',))
    color = DecodedImageCache('disk', cdir, params=('color',))
    gray.get(path, lambda p: np.zeros((2, 2), np.uint8))
    out = color.get(path, lambda p: np.ones((2, 2), np.uint8))
    assert out.max() == 1  # did not serve the gray entry


def test_build_img_cache_dispatch():
    assert build_img_cache(None) is None
    assert build_img_cache('none') is None
    assert build_img_cache(False) is None
    assert build_img_cache('ram').mode == 'ram'
    with pytest.raises(ValueError):
        build_img_cache('mmap')


def _seg_fixture(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    gt = rng.randint(0, 3, (16, 16)).astype(np.uint8)
    ipath, gpath = str(tmp_path / 'i.png'), str(tmp_path / 'g.png')
    Image.fromarray(img).save(ipath)
    Image.fromarray(gt).save(gpath)
    return ipath, gpath, img, gt


def _load_results(ipath, gpath):
    return dict(img_info=dict(filename=ipath),
                ann_info=dict(seg_map=gpath),
                img_prefix=None, seg_prefix=None, seg_fields=[])


@pytest.mark.parametrize('mode', ['ram', 'disk'])
def test_load_transforms_cached_equals_uncached(mode, tmp_path):
    ipath, gpath, _, _ = _seg_fixture(tmp_path)
    clear_ram_cache()
    cdir = str(tmp_path / 'c')
    plain_i = LoadImageFromFile()(_load_results(ipath, gpath))
    plain_g = LoadAnnotations()(_load_results(ipath, gpath))
    li = LoadImageFromFile(cache=mode, cache_dir=cdir)
    lg = LoadAnnotations(cache=mode, cache_dir=cdir)
    for _ in range(2):  # second round is the cache-hit path
        ri = li(_load_results(ipath, gpath))
        rg = lg(_load_results(ipath, gpath))
        np.testing.assert_array_equal(ri['img'], plain_i['img'])
        np.testing.assert_array_equal(rg['gt_semantic_seg'],
                                      plain_g['gt_semantic_seg'])


def test_annotation_mutation_does_not_poison_cache(tmp_path):
    """label_map / reduce_zero_label mutate the served array in place —
    a second serve must still see the pristine decode."""
    ipath, gpath, _, gt = _seg_fixture(tmp_path)
    clear_ram_cache()
    lg = LoadAnnotations(reduce_zero_label=True, cache='ram')
    r1 = lg(dict(_load_results(ipath, gpath), label_map={1: 2, 2: 1}))
    r2 = lg(dict(_load_results(ipath, gpath), label_map={1: 2, 2: 1}))
    np.testing.assert_array_equal(r1['gt_semantic_seg'],
                                  r2['gt_semantic_seg'])
    # and the remap actually happened (vs the raw decode)
    expected = gt.copy()
    expected[gt == 1] = 2
    expected[gt == 2] = 1
    expected[expected == 0] = 255
    expected = expected - 1
    expected[expected == 254] = 255
    np.testing.assert_array_equal(r2['gt_semantic_seg'], expected)


def test_inject_img_cache_wrapper_nesting():
    cfg = dict(
        type='RepeatDataset', times=2,
        dataset=dict(
            type='MyDataset',
            pipeline=[
                dict(type='LoadImageFromFile'),
                dict(type='LoadAnnotations', cache='ram'),  # explicit wins
                dict(type='RandomFlip', prob=0.5),
            ]))
    inject_img_cache(cfg, 'disk', cache_dir='/c')
    steps = cfg['dataset']['pipeline']
    assert steps[0]['cache'] == 'disk' and steps[0]['cache_dir'] == '/c'
    assert steps[1]['cache'] == 'ram' and 'cache_dir' not in steps[1]
    assert 'cache' not in steps[2]
    # list-of-datasets form
    lst = [dict(pipeline=[dict(type='LoadImageFromFile')]),
           dict(pipeline=[dict(type='LoadAnnotations')])]
    inject_img_cache(lst, 'ram')
    assert all(c['pipeline'][0]['cache'] == 'ram' for c in lst)
    # Load transforms nested inside wrapper transforms (TTA cfgs)
    tta = dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
             transforms=[dict(type='LoadAnnotations'),
                         dict(type='Resize', keep_ratio=False)])])
    inject_img_cache(tta, 'disk')
    assert tta['pipeline'][1]['transforms'][0]['cache'] == 'disk'
    assert 'cache' not in tta['pipeline'][1]['transforms'][1]


def test_end_to_end_dataset_with_cache(tmp_path):
    root = tmp_path / 'kits'
    rng = np.random.RandomState(0)
    for sub in ['train/images', 'train/labels']:
        os.makedirs(root / sub, exist_ok=True)
    for i in range(3):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        lbl = rng.randint(0, 2, (16, 16)).astype(np.uint8)
        Image.fromarray(img).save(root / 'train/images' / f'case_{i}.png')
        Image.fromarray(lbl).save(root / 'train/labels' / f'case_{i}.png')
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    base = dict(type='MyDataset', data_root=str(root),
                img_dir='train/images', ann_dir='train/labels',
                pipeline=pipeline)
    plain = build_dataset(dict(base, pipeline=[dict(s) for s in pipeline]))
    cached_cfg = inject_img_cache(
        dict(base, pipeline=[dict(s) for s in pipeline]),
        'disk', cache_dir=str(tmp_path / 'c'))
    cached = build_dataset(cached_cfg)
    for epoch in range(2):
        for i in range(3):
            a, b = plain[i], cached[i]
            np.testing.assert_array_equal(a['img'], b['img'])
            np.testing.assert_array_equal(a['gt_semantic_seg'],
                                          b['gt_semantic_seg'])
    assert len(os.listdir(tmp_path / 'c')) == 6  # 3 imgs + 3 gts spooled


def test_train_cli_img_cache_end_to_end(tmp_path):
    """`data.img_cache='disk'` through the real tools/train.py: trains,
    spools the decoded fixture, and a resumed second run still trains."""
    import runpy
    import sys
    rng = np.random.RandomState(0)
    for sub in ('img', 'ann'):
        (tmp_path / sub).mkdir()
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            tmp_path / 'img' / f's{i}.png')
        Image.fromarray(rng.randint(0, 2, (32, 32)).astype(np.uint8)).save(
            tmp_path / 'ann' / f's{i}.png')
    cache_dir = str(tmp_path / 'spool')
    cfg_text = f'''
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='UnetBackbone', in_channels=3,
                  channel_list=[4, 8, 8, 8]),
    decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                     decoder_channel=[16, 16, 16, 16, 4],
                     loss_decode=dict(type='CrossEntropyLoss')),
    test_cfg=dict(mode='whole'))
pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
         to_rgb=True),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
data = dict(samples_per_gpu=2, workers_per_gpu=0,
            img_cache='disk', img_cache_dir={cache_dir!r},
            train=dict(type='MyDataset', data_root={str(tmp_path)!r},
                       img_dir='img', ann_dir='ann', pipeline=pipeline))
optimizer = dict(type='Adam', lr=1e-3, betas=(0.9, 0.999))
optimizer_config = dict()
lr_config = dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=True)
runner = dict(type='EpochBasedRunner', max_epochs=1)
checkpoint_config = None
log_config = dict(interval=1, hooks=[dict(type='TextLoggerHook')])
log_level = 'INFO'
workflow = [('train', 1)]
'''
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(cfg_text)
    argv = sys.argv
    try:
        for run in range(2):  # run 2 serves from the spool
            sys.argv = ['tools/train.py', str(cfg_path),
                        '--work-dir', str(tmp_path / f'wd{run}'),
                        '--no-validate', '--seed', '0']
            runpy.run_path('tools/train.py', run_name='__main__')
            assert len(os.listdir(cache_dir)) == 8  # 4 imgs + 4 gts
    finally:
        sys.argv = argv
