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
- hue/saturation jitter operates in RGB (saturation = lerp toward gray,
  hue = rotation about the gray axis) rather than an HSV round-trip
  (cv2 HSV is host-only); brightness/contrast match.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def random_crop(rng, img, gt, crop_size: Tuple[int, int], valid_hw=None):
    """Uniform random crop of (img (B,H,W,C), gt (B,H,W)) to crop_size.

    valid_hw (B, 2) int32: the un-padded extent of each sample — crop
    offsets are bounded by it (exactly the reference's per-image bound,
    ``transforms.py:596-599``), so host padding to a static shape does not
    leak into the crop distribution.
    """
    b, h, w, _ = img.shape
    ch, cw = crop_size
    ky, kx = jax.random.split(rng)
    if valid_hw is None:
        y0 = jax.random.randint(ky, (b,), 0, max(h - ch, 0) + 1)
        x0 = jax.random.randint(kx, (b,), 0, max(w - cw, 0) + 1)
    else:
        # per-sample dynamic bound: floor(u * (extent+1)) ∈ [0, extent]
        ymax = jnp.maximum(valid_hw[:, 0] - ch, 0)
        xmax = jnp.maximum(valid_hw[:, 1] - cw, 0)
        y0 = (jax.random.uniform(ky, (b,)) * (ymax + 1)).astype(jnp.int32)
        x0 = (jax.random.uniform(kx, (b,)) * (xmax + 1)).astype(jnp.int32)

    def crop_one(im, g, y, x):
        im = jax.lax.dynamic_slice(im, (y, x, 0), (ch, cw, im.shape[-1]))
        g = jax.lax.dynamic_slice(g, (y, x), (ch, cw))
        return im, g

    return jax.vmap(crop_one)(img, gt, y0, x0)


def random_flip(rng, img, gt, prob: float = 0.5,
                direction: str = 'horizontal'):
    """Per-sample flip (horizontal or vertical)."""
    b = img.shape[0]
    flip = jax.random.bernoulli(rng, prob, (b,))
    if direction == 'horizontal':
        img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
        gt = jnp.where(flip[:, None, None], gt[:, :, ::-1], gt)
    else:
        img = jnp.where(flip[:, None, None, None], img[:, ::-1, :, :], img)
        gt = jnp.where(flip[:, None, None], gt[:, ::-1, :], gt)
    return img, gt


def photometric(rng, img, brightness_delta: float = 32.0,
                contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                hue_delta: float = 18.0):
    """Brightness/contrast/saturation/hue jitter on float images in
    [0, 255] (reference ``PhotoMetricDistortion``, each op p=0.5).

    Hue is approximated in RGB: a rotation about the gray axis
    (1,1,1)/sqrt(3) by the HSV hue angle (cv2 hue units, 180 = full
    circle) — no HSV round-trip on device. Documented delta vs the host
    transform.
    """
    b = img.shape[0]
    kb, kbm, kc, kcm, ks, ksm, kh, khm = jax.random.split(rng, 8)
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
    # hue (p=0.5): Rodrigues rotation of the color vector about the gray
    # axis; theta maps cv2's [0,180) hue circle onto [0, 2*pi)
    if hue_delta:
        theta = jax.random.uniform(kh, (b, 1, 1),
                                   minval=-hue_delta, maxval=hue_delta) \
            * (2.0 * jnp.pi / 180.0)
        do_h = jax.random.bernoulli(khm, 0.5, (b, 1, 1, 1))
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        mean = img.mean(axis=-1, keepdims=True)
        centered = img - mean
        # rotation about (1,1,1)/sqrt(3): for zero-mean color vectors the
        # aa^T term vanishes, leaving cos*v + sin*(a x v)
        inv_sqrt3 = 1.0 / jnp.sqrt(3.0)
        cx, cy, cz = (centered[..., 0], centered[..., 1], centered[..., 2])
        crossed = jnp.stack([cy - cz, cz - cx, cx - cy], -1) * inv_sqrt3
        rotated = mean + cos[..., None] * centered + \
            sin[..., None] * crossed
        img = jnp.where(do_h, rotated, img)
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
                               flip_direction: str = 'horizontal',
                               photo_metric: bool = True,
                               photo_metric_cfg: Optional[dict] = None,
                               out_dtype=jnp.float32):
    """Build ``fn(rng, img_u8, gt_u8[, valid_hw]) -> (img, gt)`` — one
    jitted program.

    img_u8 (B, H, W, 3) uint8 BGR; gt_u8 (B, H, W) uint8 labels;
    valid_hw (B, 2) optional un-padded extents (see :func:`random_crop`).
    """
    pm = dict(photo_metric_cfg or {})

    @functools.partial(jax.jit, static_argnames=())
    def pipeline(rng, img_u8, gt_u8, valid_hw=None):
        k1, k2, k3 = jax.random.split(rng, 3)
        img = img_u8.astype(jnp.float32)
        gt = gt_u8.astype(jnp.int32)
        if crop_size is not None:
            img, gt = random_crop(k1, img, gt, crop_size, valid_hw)
        img, gt = random_flip(k2, img, gt, flip_prob, flip_direction)
        if photo_metric:
            img = photometric(k3, img, **pm)
        img = normalize(img, mean, std, to_rgb)
        return img.astype(out_dtype), gt

    return pipeline


# ---------------------------------------------------------------------------
# Wiring: split a configured host pipeline into (host prefix, device params)
# and adapt a DataLoader so its batches finish on-device.  Enabled by
# ``data = dict(..., device_pipeline=True)`` (see docs/train.md).
# ---------------------------------------------------------------------------

_DEVICE_TYPES = ('RandomCrop', 'RandomFlip', 'PhotoMetricDistortion',
                 'Normalize')


def split_train_pipeline(pipeline_cfg: Sequence[dict],
                         host_size: Optional[Tuple[int, int]] = None):
    """Split a train-pipeline cfg list into the host prefix + device params.

    The device program takes over from the first RandomCrop/RandomFlip/
    PhotoMetricDistortion/Normalize onward; trailing ``Pad`` (absorbed by
    the static host shape), ``DefaultFormatBundle`` and ``Collect`` are
    dropped (the device batch is already model-ready). Raises ValueError
    for pipelines it cannot express — callers fall back to the host path.

    host_size: static (H, W) the host pads every sample to. Inferred from
    the prefix's ``Resize.img_scale`` when not given.
    """
    cfgs = [dict(c) for c in pipeline_cfg]
    first_dev = next((i for i, c in enumerate(cfgs)
                      if c['type'] in _DEVICE_TYPES), None)
    if first_dev is None:
        raise ValueError('no device-expressible transform in pipeline')
    prefix, rest = cfgs[:first_dev], cfgs[first_dev:]

    params = dict(crop_size=None, flip_prob=0.0,
                  flip_direction='horizontal', photo_metric=False,
                  photo_metric_cfg={}, mean=(0., 0., 0.), std=(1., 1., 1.),
                  to_rgb=True)
    pad_vals = dict(pad_val=0, seg_pad_val=255)
    crop_size = None
    for c in rest:
        t = c['type']
        if t == 'RandomCrop':
            crop_size = tuple(c['crop_size'])
            params['crop_size'] = crop_size
            # cat_max_ratio rejection-resampling is NOT replicated
            # (documented delta: static device control flow)
        elif t == 'RandomFlip':
            params['flip_prob'] = c.get('prob', c.get('flip_ratio', 0.5)) or 0.0
            params['flip_direction'] = c.get('direction', 'horizontal')
            if params['flip_direction'] not in ('horizontal', 'vertical'):
                raise ValueError('unsupported flip direction')
        elif t == 'PhotoMetricDistortion':
            params['photo_metric'] = True
            pm = {}
            if 'brightness_delta' in c:
                pm['brightness_delta'] = c['brightness_delta']
            if 'contrast_range' in c:
                pm['contrast_range'] = tuple(c['contrast_range'])
            if 'saturation_range' in c:
                pm['saturation_range'] = tuple(c['saturation_range'])
            if 'hue_delta' in c:
                pm['hue_delta'] = c['hue_delta']
            params['photo_metric_cfg'] = pm
        elif t == 'Normalize':
            params['mean'] = tuple(c['mean'])
            params['std'] = tuple(c['std'])
            params['to_rgb'] = c.get('to_rgb', True)
        elif t == 'Pad':
            size = c.get('size')
            if size is not None and crop_size is not None and \
                    tuple(size) != tuple(crop_size):
                raise ValueError('Pad size != crop size not supported '
                                 'on-device')
            # absorbed: host pads to the static shape, crop guarantees
            # size — but the configured pad values must carry over
            pad_vals['pad_val'] = c.get('pad_val', 0)
            pad_vals['seg_pad_val'] = c.get('seg_pad_val', 255)
        elif t in ('DefaultFormatBundle', 'Collect'):
            pass  # device batches are already formatted
        else:
            raise ValueError(f'transform {t} not device-expressible')

    if host_size is None:
        for c in prefix:
            if c['type'] == 'Resize' and c.get('img_scale') is not None:
                if c.get('ratio_range') is not None:
                    raise ValueError('ratio_range Resize needs an explicit '
                                     'device_pipeline host_size')
                scale = c['img_scale']
                scales = scale if (isinstance(scale, (list, tuple)) and
                                   isinstance(scale[0], (list, tuple))) \
                    else [scale]
                if c.get('keep_ratio', True):
                    # aspect-preserving rescale: either image dim can
                    # reach max(scale) — use the square safe bound
                    m = max(max(s) for s in scales)
                    host_size = (m, m)
                else:
                    # exact resize to img_scale, which is (w, h)
                    # (``transforms.py`` Resize contract) — host_size is
                    # (H, W)
                    host_size = (max(s[1] for s in scales),
                                 max(s[0] for s in scales))
    if host_size is None:
        raise ValueError('cannot infer a static host size; set '
                         'data.device_pipeline_size')
    if crop_size is not None and (host_size[0] < crop_size[0]
                                  or host_size[1] < crop_size[1]):
        host_size = (max(host_size[0], crop_size[0]),
                     max(host_size[1], crop_size[1]))

    host_pipeline = prefix + [
        dict(type='DeviceFormatBundle', size=tuple(host_size), **pad_vals),
        dict(type='Collect', keys=['img', 'gt_semantic_seg', 'valid_hw'],
             meta_keys=()),
    ]
    return host_pipeline, params


class DeviceBatchLoader:
    """Wrap a host :class:`DataLoader`: finish each uint8 batch on-device.

    Yields batches whose ``img``/``gt_semantic_seg`` are device arrays
    produced by the jitted augmentation program; the runner feeds them to
    the train step without any further host work (``run_iter`` passes
    jax arrays through).

    ``prefetch > 0`` stages upload + augmentation of the next batches in
    a background thread, overlapping the host→device copy and the aug
    program's dispatch with device compute. The thread preserves batch
    order and the per-batch RNG is derived from ``(pass number, batch
    index)`` — the pass number is assigned in ``__iter__`` on the main
    thread — so the augmentation stream is identical to the synchronous
    path, reproducible across restarts, and unaffected by abandoned
    epochs or overlapping iterators.
    """

    def __init__(self, loader, device_params: dict, seed: int = 0,
                 out_dtype=jnp.float32, prefetch: int = 2):
        self.loader = loader
        self.fn = make_device_train_pipeline(out_dtype=out_dtype,
                                             **device_params)
        self._rng = jax.random.PRNGKey(seed)
        self._pass = 0
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, 'set_epoch'):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def _device_batch(self, batch, pass_rng, index):
        rng = jax.random.fold_in(pass_rng, index)
        img, gt = self.fn(rng, jnp.asarray(batch['img']),
                          jnp.asarray(batch['gt_semantic_seg']),
                          jnp.asarray(batch['valid_hw']))
        out = dict(batch)
        out['img'] = img
        out['gt_semantic_seg'] = gt
        return out

    def __iter__(self):
        # one fold per iteration pass (main thread, GIL-ordered): the
        # feeder below only ever folds per-batch indices into this key
        pass_rng = jax.random.fold_in(self._rng, self._pass)
        self._pass += 1
        if self.prefetch <= 0:
            for i, batch in enumerate(self.loader):
                yield self._device_batch(batch, pass_rng, i)
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        done = object()

        def feeder():
            try:
                for i, batch in enumerate(self.loader):
                    item = self._device_batch(batch, pass_rng, i)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
                item = done
            except BaseException as e:  # re-raised on the consumer side
                item = e
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        thread = threading.Thread(target=feeder, daemon=True,
                                  name='DeviceBatchLoader-prefetch')
        thread.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer abandoned the epoch (break/close): unblock the
            # feeder so the thread exits instead of leaking on q.put
            stop.set()


def wrap_loader_with_device_pipeline(loader, dataset, pipeline_cfg,
                                     host_size=None, seed: int = 0,
                                     prefetch: int = 2):
    """Swap ``dataset``'s pipeline for the host prefix and wrap ``loader``.

    Walks wrapper datasets (Repeat/Concat) to reach the CustomDataset(s).
    Raises ValueError when the pipeline is not device-expressible.
    """
    from .pipelines import Compose
    host_cfg, params = split_train_pipeline(pipeline_cfg, host_size)
    stack = [dataset]
    found = False
    while stack:
        ds = stack.pop()
        if hasattr(ds, 'pipeline'):
            ds.pipeline = Compose(host_cfg)
            found = True
        if hasattr(ds, 'dataset'):
            stack.append(ds.dataset)
        if hasattr(ds, 'datasets'):
            stack.extend(ds.datasets)
    if not found:
        raise ValueError('no pipeline-bearing dataset found')
    return DeviceBatchLoader(loader, params, seed=seed, prefetch=prefetch)
