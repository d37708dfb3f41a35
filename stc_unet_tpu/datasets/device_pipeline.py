"""Fused on-device preprocessing (the BASELINE.json north star: the mmseg
data pipeline as jit-compiled device code).

Host workers only decode PNGs to fixed-size uint8 arrays; crop/flip/
photometric/normalize run inside ONE jitted function on device, batched —
removing the per-sample python/numpy transform cost from the input path and
shrinking H2D traffic to uint8.

Semantics mirror the host pipeline (``pipelines/transforms.py``) for the
transforms the author's config uses (RandomCrop, RandomFlip,
PhotoMetricDistortion-lite, Normalize, Pad) with two documented deltas:
- crop rejection (cat_max_ratio) is not resampled — device control flow
  must be static; the crop is uniform random.
- hue/saturation jitter operates in RGB via channel scaling rather than an
  HSV round-trip (cv2 HSV is host-only); brightness/contrast match.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def random_crop(rng, img, gt, crop_size: Tuple[int, int]):
    """Uniform random crop of (img (B,H,W,C), gt (B,H,W)) to crop_size."""
    b, h, w, _ = img.shape
    ch, cw = crop_size
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (b,), 0, max(h - ch, 0) + 1)
    x0 = jax.random.randint(kx, (b,), 0, max(w - cw, 0) + 1)

    def crop_one(im, g, y, x):
        im = jax.lax.dynamic_slice(im, (y, x, 0), (ch, cw, im.shape[-1]))
        g = jax.lax.dynamic_slice(g, (y, x), (ch, cw))
        return im, g

    return jax.vmap(crop_one)(img, gt, y0, x0)


def random_flip(rng, img, gt, prob: float = 0.5):
    """Per-sample horizontal flip."""
    b = img.shape[0]
    flip = jax.random.bernoulli(rng, prob, (b,))
    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
    gt = jnp.where(flip[:, None, None], gt[:, :, ::-1], gt)
    return img, gt


def photometric(rng, img, brightness_delta: float = 32.0,
                contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5)):
    """Brightness/contrast/saturation jitter on float images in [0, 255]."""
    b = img.shape[0]
    kb, kbm, kc, kcm, ks, ksm = jax.random.split(rng, 6)
    img = img.astype(jnp.float32)
    # brightness (p=0.5)
    delta = jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness_delta,
                               maxval=brightness_delta)
    do_b = jax.random.bernoulli(kbm, 0.5, (b, 1, 1, 1))
    img = jnp.where(do_b, img + delta, img)
    # contrast (p=0.5)
    alpha = jax.random.uniform(kc, (b, 1, 1, 1), minval=contrast_range[0],
                               maxval=contrast_range[1])
    do_c = jax.random.bernoulli(kcm, 0.5, (b, 1, 1, 1))
    img = jnp.where(do_c, img * alpha, img)
    # saturation (p=0.5): lerp towards the grayscale image
    sat = jax.random.uniform(ks, (b, 1, 1, 1),
                             minval=saturation_range[0],
                             maxval=saturation_range[1])
    do_s = jax.random.bernoulli(ksm, 0.5, (b, 1, 1, 1))
    gray = img.mean(axis=-1, keepdims=True)
    img = jnp.where(do_s, gray + (img - gray) * sat, img)
    return jnp.clip(img, 0.0, 255.0)


def normalize(img, mean, std, to_rgb: bool = True):
    img = img.astype(jnp.float32)
    if to_rgb:
        img = img[..., ::-1]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def make_device_train_pipeline(crop_size: Tuple[int, int],
                               mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                               to_rgb: bool = True, flip_prob: float = 0.5,
                               photo_metric: bool = True,
                               out_dtype=jnp.float32):
    """Build ``fn(rng, img_u8, gt_u8) -> (img, gt)`` — one jitted program.

    img_u8 (B, H, W, 3) uint8 BGR; gt_u8 (B, H, W) uint8 labels.
    """

    @jax.jit
    def pipeline(rng, img_u8, gt_u8):
        k1, k2, k3 = jax.random.split(rng, 3)
        img = img_u8.astype(jnp.float32)
        gt = gt_u8.astype(jnp.int32)
        img, gt = random_crop(k1, img, gt, crop_size)
        img, gt = random_flip(k2, img, gt, flip_prob)
        if photo_metric:
            img = photometric(k3, img)
        img = normalize(img, mean, std, to_rgb)
        return img.astype(out_dtype), gt

    return pipeline
