"""On-device fused preprocessing tests."""
import jax
import numpy as np

from stc_unet_tpu.datasets.device_pipeline import (
    make_device_train_pipeline, normalize, random_crop, random_flip)


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
