"""On-device fused preprocessing tests."""
import jax
import numpy as np
import pytest

from stc_unet_tpu.datasets.device_pipeline import (
    DeviceBatchLoader, make_device_train_pipeline, normalize, random_crop,
    random_flip, split_train_pipeline, wrap_loader_with_device_pipeline)


def test_device_pipeline_shapes_and_determinism():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (4, 40, 40, 3), dtype=np.uint8)
    gt = rng.randint(0, 2, (4, 40, 40)).astype(np.uint8)
    pipe = make_device_train_pipeline((32, 32), mean=[0, 0, 0],
                                      std=[255, 255, 255])
    key = jax.random.PRNGKey(0)
    out_img, out_gt = pipe(key, img, gt)
    assert out_img.shape == (4, 32, 32, 3)
    assert out_gt.shape == (4, 32, 32)
    assert float(out_img.max()) <= 1.0 + 1e-6
    # deterministic per key
    out2, gt2 = pipe(key, img, gt)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out2))
    # different key → different augmentation
    out3, _ = pipe(jax.random.PRNGKey(1), img, gt)
    assert not np.array_equal(np.asarray(out_img), np.asarray(out3))


def test_random_crop_alignment():
    """Crop keeps img and gt aligned."""
    img = np.arange(4 * 8 * 8 * 1).reshape(4, 8, 8, 1).astype(np.float32)
    gt = img[..., 0].astype(np.int32)
    ci, cg = random_crop(jax.random.PRNGKey(0), img, gt, (4, 4))
    np.testing.assert_array_equal(np.asarray(ci[..., 0]).astype(np.int32),
                                  np.asarray(cg))


def test_normalize_matches_host():
    from stc_unet_tpu.utils.image import imnormalize
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (8, 8, 3)).astype(np.float32)
    mean, std = [10, 20, 30], [2, 3, 4]
    host = imnormalize(img.copy(), mean, std, to_rgb=True)
    dev = np.asarray(normalize(img[None], mean, std, to_rgb=True))[0]
    np.testing.assert_allclose(host, dev, rtol=1e-5)


# ---------------------------------------------------------------------------
# Wiring (cfg flag → host-prefix split → DeviceBatchLoader)
# ---------------------------------------------------------------------------

KITS_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(600, 600)),
    dict(type='RandomCrop', crop_size=(512, 512), cat_max_ratio=0.75),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
    dict(type='Pad', size=(512, 512), pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]


def test_split_train_pipeline_kits():
    """The flagship pipeline splits into host prefix + device params."""
    host_cfg, params = split_train_pipeline(KITS_PIPELINE)
    types = [c['type'] for c in host_cfg]
    assert types == ['LoadImageFromFile', 'LoadAnnotations', 'Resize',
                     'DeviceFormatBundle', 'Collect']
    assert host_cfg[3]['size'] == (600, 600)
    assert params['crop_size'] == (512, 512)
    assert params['flip_prob'] == 0.5
    assert params['photo_metric'] is True
    assert params['to_rgb'] is True


def test_split_train_pipeline_rejects_unexpressible():
    with pytest.raises(ValueError):
        split_train_pipeline([dict(type='LoadImageFromFile'),
                              dict(type='Collect', keys=['img'])])
    bad = list(KITS_PIPELINE)
    bad.insert(4, dict(type='RandomRotate', prob=1.0, degree=30))
    with pytest.raises(ValueError):
        split_train_pipeline(bad)


def test_device_format_bundle_pads_and_records_extent():
    from stc_unet_tpu.datasets import PIPELINES
    bundle = PIPELINES.build(dict(type='DeviceFormatBundle', size=(16, 20)))
    res = bundle(dict(img=np.ones((10, 12, 3), np.uint8) * 7,
                      gt_semantic_seg=np.ones((10, 12), np.uint8)))
    assert res['img'].shape == (16, 20, 3) and res['img'].dtype == np.uint8
    assert res['gt_semantic_seg'].shape == (16, 20)
    np.testing.assert_array_equal(res['valid_hw'], [10, 12])
    assert res['img'][12, 3, 0] == 0            # img pad_val
    assert res['gt_semantic_seg'][12, 3] == 255  # seg_pad_val


def test_crop_respects_valid_extent():
    """Crop offsets never reach into the host padding."""
    img = np.zeros((6, 40, 40, 3), np.float32)
    gt = np.full((6, 40, 40), 255, np.int32)
    gt[:, :24, :28] = 1                      # valid region (24, 28)
    valid = np.tile(np.array([[24, 28]], np.int32), (6, 1))
    for seed in range(5):
        _, cg = random_crop(jax.random.PRNGKey(seed), img, gt, (16, 16),
                            jax.numpy.asarray(valid))
        assert int(np.asarray(cg).max()) == 1, 'crop hit the padded region'


def _host_equivalent(img_u8, y0, x0, flipped, crop, mean, std):
    """Reference-semantics crop→flip→normalize in numpy (BGR→RGB)."""
    ref = img_u8[y0:y0 + crop, x0:x0 + crop].astype(np.float32)
    if flipped:
        ref = ref[:, ::-1]
    ref = ref[..., ::-1]
    return (ref - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def test_device_pipeline_matches_host_semantics():
    """photo_metric off: every device output equals a host-computed
    crop→flip→normalize of the same sample (deltas only exist in the
    photometric + cat_max_ratio stages)."""
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (3, 24, 24, 3), dtype=np.uint8)
    gt = rs.randint(0, 2, (3, 24, 24)).astype(np.uint8)
    mean, std = [5.0, 6.0, 7.0], [2.0, 3.0, 4.0]
    pipe = make_device_train_pipeline((16, 16), mean=mean, std=std,
                                      to_rgb=True, flip_prob=0.5,
                                      photo_metric=False)
    out_img, out_gt = pipe(jax.random.PRNGKey(7), img, gt)
    out_img, out_gt = np.asarray(out_img), np.asarray(out_gt)
    for b in range(3):
        matched = False
        for y0 in range(9):
            for x0 in range(9):
                for flipped in (False, True):
                    ref = _host_equivalent(img[b], y0, x0, flipped, 16,
                                           mean, std)
                    if np.allclose(ref, out_img[b], atol=1e-4):
                        rg = gt[b, y0:y0 + 16, x0:x0 + 16].astype(np.int32)
                        if flipped:
                            rg = rg[:, ::-1]
                        np.testing.assert_array_equal(rg, out_gt[b])
                        matched = True
        assert matched, f'sample {b}: no (crop, flip) explains the output'


def test_wrap_loader_end_to_end(tmp_path):
    """cfg-flag wiring: dataset pipeline swapped, loader yields device
    batches with model-ready shapes/dtypes."""
    import cv2
    from stc_unet_tpu.datasets import build_dataloader, build_dataset
    rs = np.random.RandomState(0)
    (tmp_path / 'img').mkdir()
    (tmp_path / 'ann').mkdir()
    for i in range(4):
        cv2.imwrite(str(tmp_path / 'img' / f's{i}.png'),
                    rs.randint(0, 255, (40, 40, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / 'ann' / f's{i}.png'),
                    rs.randint(0, 2, (40, 40)).astype(np.uint8))
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=(48, 48)),
        dict(type='RandomCrop', crop_size=(32, 32)),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
             to_rgb=True),
        dict(type='Pad', size=(32, 32)),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    ds = build_dataset(dict(type='CustomDataset', data_root=str(tmp_path),
                            img_dir='img', ann_dir='ann',
                            img_suffix='.png', seg_map_suffix='.png',
                            classes=('bg', 'fg'),
                            palette=[[0, 0, 0], [1, 1, 1]],
                            pipeline=pipeline))
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=0,
                              dist=False, shuffle=True, seed=0)
    wrapped = wrap_loader_with_device_pipeline(loader, ds, pipeline, seed=0)
    assert isinstance(wrapped, DeviceBatchLoader)
    batches = list(wrapped)
    assert len(batches) == len(loader) == 2
    for batch in batches:
        img, gt = batch['img'], batch['gt_semantic_seg']
        assert isinstance(img, jax.Array) and isinstance(gt, jax.Array)
        assert img.shape == (2, 32, 32, 3) and img.dtype == 'float32'
        assert gt.shape == (2, 32, 32)
        assert float(jax.numpy.abs(img).max()) <= 1.0 + 1e-6
        labels = set(np.unique(np.asarray(gt)))
        assert labels <= {0, 1}   # 48x48 host size ≥ crop → no pad labels
    # epoch reshuffle API passes through
    wrapped.set_epoch(1)
    assert len(list(wrapped)) == 2


# ---------------------------------------------------------------------------
# Round-3 review regressions
# ---------------------------------------------------------------------------

def test_host_size_respects_wh_scale_convention():
    """Resize img_scale is (w, h); keep_ratio=False must produce an
    (H, W) host size, not a transposed one (review finding 1)."""
    pipe = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=[(100, 40), (80, 40)],
             keep_ratio=False, multiscale_mode='value'),
        dict(type='RandomCrop', crop_size=(32, 32)),
        dict(type='Normalize', mean=[0, 0, 0], std=[1, 1, 1]),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    host_cfg, _ = split_train_pipeline(pipe)
    bundle = next(c for c in host_cfg if c['type'] == 'DeviceFormatBundle')
    assert bundle['size'] == (40, 100)  # (H, W)
    # keep_ratio=True: either dim can reach max(scale) → square bound
    pipe[2] = dict(type='Resize', img_scale=(100, 40), keep_ratio=True)
    host_cfg, _ = split_train_pipeline(pipe)
    bundle = next(c for c in host_cfg if c['type'] == 'DeviceFormatBundle')
    assert bundle['size'] == (100, 100)


def test_device_format_bundle_refuses_oversize():
    """Samples larger than the static size raise instead of silently
    cropping (review finding 3)."""
    from stc_unet_tpu.datasets import PIPELINES
    bundle = PIPELINES.build(dict(type='DeviceFormatBundle', size=(16, 16)))
    with pytest.raises(ValueError, match='exceeds the static host size'):
        bundle(dict(img=np.zeros((20, 10, 3), np.uint8)))


def test_split_carries_pad_values():
    """Pad(pad_val, seg_pad_val) forward into DeviceFormatBundle
    (review finding 5)."""
    pipe = list(KITS_PIPELINE)
    pipe[7] = dict(type='Pad', size=(512, 512), pad_val=128, seg_pad_val=0)
    host_cfg, _ = split_train_pipeline(pipe)
    bundle = next(c for c in host_cfg if c['type'] == 'DeviceFormatBundle')
    assert bundle['pad_val'] == 128 and bundle['seg_pad_val'] == 0


def test_photometric_hue_jitter_active():
    """hue_delta is honored on-device (review finding 6): with all other
    jitters disabled, outputs differ from input for some sample, and
    per-pixel luminance (the gray-axis component) is preserved."""
    from stc_unet_tpu.datasets.device_pipeline import photometric
    rs = np.random.RandomState(0)
    # values away from [0, 255] edges so clipping can't bend luminance
    img = rs.rand(4, 8, 8, 3).astype(np.float32) * 60 + 100
    out = np.asarray(photometric(
        jax.random.PRNGKey(3), img, brightness_delta=0.0,
        contrast_range=(1.0, 1.0), saturation_range=(1.0, 1.0),
        hue_delta=18.0))
    assert not np.allclose(out, img)
    np.testing.assert_allclose(out.mean(-1), img.mean(-1), atol=1e-3)
    # hue_delta=0 → identity
    out0 = np.asarray(photometric(
        jax.random.PRNGKey(3), img, brightness_delta=0.0,
        contrast_range=(1.0, 1.0), saturation_range=(1.0, 1.0),
        hue_delta=0.0))
    np.testing.assert_allclose(out0, img, atol=1e-4)


def test_train_segmentor_device_pipeline_wrapper_cfg(tmp_path):
    """RepeatDataset-wrapped train cfg resolves its nested pipeline and
    enables the device path (review finding 2)."""
    import cv2
    from stc_unet_tpu.apis import train_segmentor
    from stc_unet_tpu.datasets import DeviceBatchLoader, build_dataset
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config
    rs = np.random.RandomState(0)
    for sub in ('img', 'ann'):
        (tmp_path / sub).mkdir()
    for i in range(4):
        cv2.imwrite(str(tmp_path / 'img' / f's{i}.png'),
                    rs.randint(0, 255, (32, 32, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / 'ann' / f's{i}.png'),
                    rs.randint(0, 2, (32, 32)).astype(np.uint8))
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=(32, 32), keep_ratio=False),
        dict(type='RandomCrop', crop_size=(24, 24)),
        dict(type='RandomFlip', prob=0.5),
        dict(type='Normalize', mean=[0, 0, 0], std=[255, 255, 255],
             to_rgb=True),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    inner = dict(type='MyDataset', data_root=str(tmp_path), img_dir='img',
                 ann_dir='ann', pipeline=pipeline)
    cfg = Config(dict(
        model=dict(
            type='EncoderDecoder',
            backbone=dict(type='UnetBackbone', in_channels=3,
                          channel_list=[4, 8, 8, 8]),
            decode_head=dict(type='UnetHead', num_classes=2, channels=4,
                             decoder_channel=[16, 16, 16, 16, 4],
                             loss_decode=dict(type='CrossEntropyLoss')),
            test_cfg=dict(mode='whole')),
        data=dict(samples_per_gpu=2, workers_per_gpu=0,
                  device_pipeline=True,
                  train=dict(type='RepeatDataset', times=2, dataset=inner)),
        optimizer=dict(type='Adam', lr=1e-3, betas=(0.9, 0.999)),
        optimizer_config=dict(),
        lr_config=dict(policy='poly', power=0.9, min_lr=1e-6,
                       by_epoch=True),
        runner=dict(type='EpochBasedRunner', max_epochs=1),
        checkpoint_config=None,
        log_config=dict(interval=1, hooks=[dict(type='TextLoggerHook')]),
        log_level='INFO', work_dir=str(tmp_path / 'wd'),
        workflow=[('train', 1)], seed=0))
    model = build_segmentor(cfg.model)
    model.init_weights(seed=0)
    runner = train_segmentor(model, build_dataset(cfg.data.train), cfg)
    assert isinstance(runner.data_loader, DeviceBatchLoader)
    # global batch = samples_per_gpu * 8 virtual devices = 16 → one batch
    assert runner.iter == len(runner.data_loader) >= 1


# ---------------------------------------------------------------------------
# Prefetch overlap (round 3: the ~270 ms/batch tunnel upload)
# ---------------------------------------------------------------------------

class _ListLoader:
    """Minimal host-loader stand-in: fixed uint8 batches, no shuffling."""

    def __init__(self, batches):
        self.batches = batches
        self.epoch = None

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        return iter(self.batches)


def _u8_batches(n=4, b=2, hw=16):
    rs = np.random.RandomState(0)
    out = []
    for _ in range(n):
        out.append(dict(
            img=rs.randint(0, 255, (b, hw, hw, 3), dtype=np.uint8),
            gt_semantic_seg=rs.randint(0, 2, (b, hw, hw)).astype(np.uint8),
            valid_hw=np.tile([hw, hw], (b, 1)).astype(np.int32),
            img_metas=[{}] * b))
    return out


def _params(hw=16):
    return dict(crop_size=(8, 8), mean=(0., 0., 0.), std=(255., 255., 255.))


def test_prefetch_matches_synchronous_stream():
    """prefetch>0 must yield the identical batch/RNG sequence as the
    synchronous path — order-preserving background thread."""
    batches = _u8_batches()
    sync = DeviceBatchLoader(_ListLoader(batches), _params(), seed=0,
                             prefetch=0)
    pre = DeviceBatchLoader(_ListLoader(batches), _params(), seed=0,
                            prefetch=2)
    for epoch in range(2):  # counter keeps advancing across epochs
        got_s = list(sync)
        got_p = list(pre)
        assert len(got_s) == len(got_p) == 4
        for bs, bp in zip(got_s, got_p):
            np.testing.assert_array_equal(np.asarray(bs['img']),
                                          np.asarray(bp['img']))
            np.testing.assert_array_equal(np.asarray(bs['gt_semantic_seg']),
                                          np.asarray(bp['gt_semantic_seg']))


def test_prefetch_abandoned_epoch_thread_exits():
    import threading
    loader = DeviceBatchLoader(_ListLoader(_u8_batches(n=8)), _params(),
                               seed=0, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit → finally sets the stop flag
    for _ in range(100):
        alive = [t for t in threading.enumerate()
                 if t.name == 'DeviceBatchLoader-prefetch' and t.is_alive()]
        if not alive:
            break
        import time
        time.sleep(0.05)
    assert not alive, 'prefetch feeder thread leaked after early close'


def test_prefetch_abandoned_pass_keeps_rng_deterministic():
    """An abandoned pass must not shift later passes' augmentation RNG:
    the per-batch key derives from (pass number, index), not a shared
    counter the feeder may have over-advanced."""
    batches = _u8_batches()
    ref = DeviceBatchLoader(_ListLoader(batches), _params(), seed=0,
                            prefetch=0)
    list(ref)                   # pass 0
    want = list(ref)            # pass 1 (full)
    loader = DeviceBatchLoader(_ListLoader(batches), _params(), seed=0,
                               prefetch=2)
    it = iter(loader)
    next(it)                    # pass 0, abandoned after one batch
    it.close()
    got = list(loader)          # pass 1
    for bw, bg in zip(want, got):
        np.testing.assert_array_equal(np.asarray(bw['img']),
                                      np.asarray(bg['img']))


def test_prefetch_propagates_host_errors():
    class _Boom(_ListLoader):
        def __iter__(self):
            yield self.batches[0]
            raise RuntimeError('host decode failed')

    loader = DeviceBatchLoader(_Boom(_u8_batches(n=2)), _params(),
                               seed=0, prefetch=2)
    with pytest.raises(RuntimeError, match='host decode failed'):
        list(loader)
