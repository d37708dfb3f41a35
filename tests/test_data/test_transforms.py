"""Transform tests (≙ reference ``tests/test_data/test_transform.py``)."""
import numpy as np
import pytest

from stc_unet_tpu.datasets import PIPELINES


def _base_results(h=32, w=48, c=3, with_seg=True):
    rng = np.random.RandomState(0)
    results = {
        'img': rng.randint(0, 255, (h, w, c), dtype=np.uint8),
        'img_shape': (h, w, c),
        'ori_shape': (h, w, c),
        'pad_shape': (h, w, c),
        'scale_factor': 1.0,
        'seg_fields': [],
    }
    if with_seg:
        results['gt_semantic_seg'] = rng.randint(0, 4, (h, w),
                                                 dtype=np.uint8)
        results['seg_fields'].append('gt_semantic_seg')
    return results


def test_resize_fixed_no_keep_ratio():
    t = PIPELINES.build(dict(type='Resize', img_scale=(60, 40),
                             keep_ratio=False))
    r = t(_base_results())
    assert r['img'].shape == (40, 60, 3)  # img_scale is (w, h)
    assert r['gt_semantic_seg'].shape == (40, 60)
    assert r['img_shape'] == (40, 60, 3)
    np.testing.assert_allclose(r['scale_factor'],
                               [60 / 48, 40 / 32, 60 / 48, 40 / 32])


def test_resize_keep_ratio():
    t = PIPELINES.build(dict(type='Resize', img_scale=(64, 64),
                             keep_ratio=True))
    r = t(_base_results())
    # 32x48 → fits into 64 box: factor 64/48
    assert r['img'].shape[1] == 64
    assert r['keep_ratio'] is True


def test_resize_ratio_range():
    np.random.seed(0)
    t = PIPELINES.build(dict(type='Resize', img_scale=(60, 40),
                             ratio_range=(0.5, 2.0), keep_ratio=False))
    r = t(_base_results())
    h, w = r['img'].shape[:2]
    assert 20 <= h <= 80 and 30 <= w <= 120


def test_resize_multiscale_value():
    np.random.seed(0)
    t = PIPELINES.build(dict(type='Resize',
                             img_scale=[(60, 40), (30, 20)],
                             multiscale_mode='value', keep_ratio=False))
    r = t(_base_results())
    assert r['img'].shape[:2] in [(40, 60), (20, 30)]


def test_random_flip():
    results = _base_results()
    img = results['img'].copy()
    t = PIPELINES.build(dict(type='RandomFlip', prob=1.0))
    r = t(results)
    assert r['flip'] is True
    np.testing.assert_array_equal(r['img'], img[:, ::-1])
    # legacy alias used by the author's configs
    t2 = PIPELINES.build(dict(type='RandomFlip', flip_ratio=0.0))
    r2 = t2(_base_results())
    assert r2['flip'] is False


def test_pad_fixed_size():
    t = PIPELINES.build(dict(type='Pad', size=(64, 64), pad_val=0,
                             seg_pad_val=255))
    r = t(_base_results())
    assert r['img'].shape == (64, 64, 3)
    assert r['gt_semantic_seg'].shape == (64, 64)
    assert (r['gt_semantic_seg'][40:, :] == 255).all()
    assert r['pad_shape'] == (64, 64, 3)


def test_pad_divisor():
    t = PIPELINES.build(dict(type='Pad', size_divisor=32))
    r = t(_base_results(h=33, w=48))
    assert r['img'].shape == (64, 64, 3)


def test_normalize():
    t = PIPELINES.build(dict(type='Normalize', mean=[127.5, 127.5, 127.5],
                             std=[127.5, 127.5, 127.5], to_rgb=True))
    results = _base_results()
    bgr = results['img'].copy()
    r = t(results)
    expected = (bgr[..., ::-1].astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(r['img'], expected, rtol=1e-5)


def test_random_crop_shape():
    np.random.seed(0)
    t = PIPELINES.build(dict(type='RandomCrop', crop_size=(16, 16)))
    r = t(_base_results())
    assert r['img'].shape == (16, 16, 3)
    assert r['gt_semantic_seg'].shape == (16, 16)


def test_random_crop_cat_max_ratio():
    np.random.seed(0)
    results = _base_results(h=64, w=64)
    # make half the label foreground so a diverse crop exists
    results['gt_semantic_seg'][:] = 0
    results['gt_semantic_seg'][:, 32:] = 1
    t = PIPELINES.build(dict(type='RandomCrop', crop_size=(32, 32),
                             cat_max_ratio=0.75))
    r = t(results)
    labels, cnt = np.unique(r['gt_semantic_seg'], return_counts=True)
    assert np.max(cnt) / np.sum(cnt) < 0.76


def test_photometric_distortion():
    np.random.seed(3)
    t = PIPELINES.build(dict(type='PhotoMetricDistortion'))
    r = t(_base_results())
    assert r['img'].dtype == np.uint8
    assert r['img'].shape == (32, 48, 3)


def test_rerange():
    t = PIPELINES.build(dict(type='Rerange', min_value=0, max_value=1))
    r = t(_base_results())
    assert 0 <= r['img'].min() and r['img'].max() <= 1


def test_rgb2gray():
    t = PIPELINES.build(dict(type='RGB2Gray'))
    r = t(_base_results())
    assert r['img'].shape == (32, 48, 3)
    assert np.allclose(r['img'][..., 0], r['img'][..., 1])


def test_adjust_gamma_identity():
    t = PIPELINES.build(dict(type='AdjustGamma', gamma=1.0))
    results = _base_results()
    img = results['img'].copy()
    r = t(results)
    np.testing.assert_array_equal(r['img'], img)


def test_seg_rescale():
    t = PIPELINES.build(dict(type='SegRescale', scale_factor=0.5))
    r = t(_base_results())
    assert r['gt_semantic_seg'].shape == (16, 24)


def test_random_rotate():
    np.random.seed(0)
    t = PIPELINES.build(dict(type='RandomRotate', prob=1.0, degree=30))
    r = t(_base_results())
    assert r['img'].shape == (32, 48, 3)


def test_random_cutout():
    np.random.seed(0)
    t = PIPELINES.build(dict(type='RandomCutOut', prob=1.0, n_holes=2,
                             cutout_shape=(4, 4), seg_fill_in=255))
    r = t(_base_results())
    assert (r['gt_semantic_seg'] == 255).any()


def test_resize_to_multiple():
    t = PIPELINES.build(dict(type='ResizeToMultiple', size_divisor=32))
    r = t(_base_results(h=33, w=47))
    assert r['img'].shape == (64, 64, 3)


def test_clahe():
    t = PIPELINES.build(dict(type='CLAHE'))
    r = t(_base_results())
    assert r['img'].shape == (32, 48, 3)


def test_to_data_container_composes_and_passes_through():
    """Reference pipelines containing ToDataContainer must compose
    (name-parity no-op: the loader already pads/stacks statically)."""
    import numpy as np
    from stc_unet_tpu.datasets.pipelines import Compose
    pipe = Compose([
        dict(type='ToDataContainer',
             fields=(dict(key='img', stack=True),
                     dict(key='gt_semantic_seg'))),
    ])
    results = dict(img=np.zeros((4, 4, 3), np.float32),
                   gt_semantic_seg=np.zeros((4, 4), np.int64))
    out = pipe(dict(results))
    assert out['img'].shape == (4, 4, 3)
    assert out['gt_semantic_seg'].dtype == np.int64


def test_multiscale_flip_aug_ratios_and_directions():
    """img_ratios x flip_direction expansion (reference
    test_time_aug.py): 2 ratios x (1 + 2 flips) = 6 aug views."""
    import numpy as np
    from stc_unet_tpu.datasets.pipelines import Compose
    pipe = Compose([dict(
        type='MultiScaleFlipAug', img_scale=(32, 32),
        img_ratios=[0.5, 1.0], flip=True,
        flip_direction=['horizontal', 'vertical'],
        transforms=[
            dict(type='Resize', keep_ratio=False),
            dict(type='RandomFlip'),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])])
    results = dict(img=np.zeros((20, 20, 3), np.float32),
                   img_shape=(20, 20, 3), ori_shape=(20, 20, 3),
                   img_fields=['img'], scale_factor=1.0)
    out = pipe(results)
    # mmcv loops scales x [False, True] x directions: the no-flip view is
    # duplicated per direction -> 2 * 2 * 2 = 8 views
    assert len(out['img']) == 8
    shapes = {tuple(i.shape[-2:]) if i.ndim == 3 else tuple(i.shape[:2])
              for i in out['img']}
    assert len(shapes) == 2  # two distinct scales
    flips = [m['flip'] for m in out['img_metas']]
    assert flips.count(True) == 4 and flips.count(False) == 4
    dirs = {m['flip_direction'] for m in out['img_metas']
            if m['flip']}
    assert dirs == {'horizontal', 'vertical'}


# ---------------------------------------------------------------------------
# Negative-path constructor contracts (≙ the 31 pytest.raises in reference
# tests/test_data/test_transform.py).
# ---------------------------------------------------------------------------

def _raises(cfg):
    with pytest.raises(AssertionError):
        PIPELINES.build(cfg)


def test_resize_contracts():
    # img_scale list entries must be tuples (reference test_transform.py:36)
    _raises(dict(type='Resize', img_scale=[1333, 800], keep_ratio=True))
    # multi-scale + ratio_range is invalid (:41)
    _raises(dict(type='Resize', img_scale=[(1333, 800), (1333, 600)],
                 ratio_range=(0.9, 1.1), keep_ratio=True))
    # invalid multiscale_mode (:50)
    _raises(dict(type='Resize', img_scale=[(1333, 800), (1333, 600)],
                 keep_ratio=True, multiscale_mode='2'))


def test_flip_contracts():
    _raises(dict(type='RandomFlip', prob=1.5))
    _raises(dict(type='RandomFlip', prob=1, direction='horizonta'))


def test_random_crop_contract():
    _raises(dict(type='RandomCrop', crop_size=(-1, 0)))


def test_pad_contract():
    _raises(dict(type='Pad'))


def test_rotate_contracts():
    _raises(dict(type='RandomRotate', prob=0.5, degree=-10))
    _raises(dict(type='RandomRotate', prob=0.5, degree=(10., 20., 30.)))


def test_rgb2gray_contracts():
    _raises(dict(type='RGB2Gray', out_channels=-1))
    _raises(dict(type='RGB2Gray', out_channels=1, weights=1.1))


def test_adjust_gamma_contracts():
    _raises(dict(type='AdjustGamma', gamma=0))
    _raises(dict(type='AdjustGamma', gamma=[1.2]))


def test_rerange_contracts():
    _raises(dict(type='Rerange', min_value=[0], max_value=[255]))
    _raises(dict(type='Rerange', min_value=1, max_value=1))
    # constant image rejected at call time (reference :437)
    t = PIPELINES.build(dict(type='Rerange', min_value=0, max_value=1))
    with pytest.raises(AssertionError):
        t({'img': np.array([[1, 1], [1, 1]])})


def test_clahe_contracts():
    _raises(dict(type='CLAHE', clip_limit=None))
    _raises(dict(type='CLAHE', tile_grid_size=(8.0, 8.0)))
    _raises(dict(type='CLAHE', tile_grid_size=(9, 9, 9)))


def test_cutout_contracts():
    _raises(dict(type='RandomCutOut', prob=1.5, n_holes=1))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=(5, 3),
                 cutout_shape=(8, 8)))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=(3, 4, 5),
                 cutout_shape=(8, 8)))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1, cutout_shape=8))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1, cutout_ratio=0.2))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1,
                 cutout_shape=(2, 2), cutout_ratio=(0.4, 0.4)))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1,
                 cutout_shape=(8, 8), seg_fill_in='a'))
    _raises(dict(type='RandomCutOut', prob=0.5, n_holes=1,
                 cutout_shape=(8, 8), seg_fill_in=256))


def test_mosaic_contracts():
    _raises(dict(type='RandomMosaic', prob=1.5))
    _raises(dict(type='RandomMosaic', prob=1, img_scale=640))
    # missing mix_results rejected at call time (reference :669)
    t = PIPELINES.build(dict(type='RandomMosaic', prob=1,
                             img_scale=(10, 12)))
    with pytest.raises(AssertionError):
        t(_base_results())
