"""Data-augmentation transforms (≙ reference ``datasets/pipelines/transforms.py``).

Host-side numpy/cv2 transforms with the reference's exact semantics (scale
sampling modes, crop rejection loops, photometric distortion order).
Randomness uses global ``np.random`` like the reference; per-worker seeding
happens in the dataloader (reference ``datasets/builder.py:181``).
"""
from __future__ import annotations

import numpy as np

from stc_unet_tpu.utils import image as mmimg
from ..builder import PIPELINES


@PIPELINES.register_module()
class ResizeToMultiple:
    """Pad-free resize of img (+segs) up to a multiple of ``size_divisor``
    (reference ``transforms.py:13``)."""

    def __init__(self, size_divisor=32, interpolation=None):
        self.size_divisor = size_divisor
        self.interpolation = interpolation

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[:2]
        new_h = int(np.ceil(h / self.size_divisor)) * self.size_divisor
        new_w = int(np.ceil(w / self.size_divisor)) * self.size_divisor
        img = mmimg.imresize(
            img, (new_w, new_h),
            interpolation=self.interpolation or 'bilinear')
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        for key in results.get('seg_fields', []):
            gt_seg = results[key]
            results[key] = mmimg.imresize(gt_seg, (new_w, new_h),
                                          interpolation='nearest')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(size_divisor={self.size_divisor}, '
                f'interpolation={self.interpolation})')


@PIPELINES.register_module()
class Resize:
    """Multi-scale resize (reference ``transforms.py:70``).

    Scale sampling modes (mmseg semantics): fixed single scale; 'range'
    (random long/short edge between two scales); 'value' (random choice from
    a list); ratio_range (random ratio on one scale, or on the original
    image shape when ``img_scale`` is None). ``img_scale`` tuples are (w, h)
    like mmcv. ``keep_ratio`` rescales into the scale box; otherwise exact
    resize.
    """

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None, keep_ratio=True, min_size=None):
        if img_scale is None:
            self.img_scale = None
        else:
            if isinstance(img_scale, list):
                self.img_scale = img_scale
            else:
                self.img_scale = [img_scale]
            # reference transforms.py:122 (mmcv.is_list_of(..., tuple))
            assert all(isinstance(s, tuple) for s in self.img_scale)
        if ratio_range is not None:
            assert self.img_scale is None or len(self.img_scale) == 1
        else:
            assert multiscale_mode in ['value', 'range']
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.min_size = min_size

    @staticmethod
    def random_select(img_scales):
        scale_idx = np.random.randint(len(img_scales))
        return img_scales[scale_idx], scale_idx

    @staticmethod
    def random_sample(img_scales):
        assert len(img_scales) == 2
        img_scale_long = [max(s) for s in img_scales]
        img_scale_short = [min(s) for s in img_scales]
        long_edge = np.random.randint(min(img_scale_long),
                                      max(img_scale_long) + 1)
        short_edge = np.random.randint(min(img_scale_short),
                                       max(img_scale_short) + 1)
        return (long_edge, short_edge), None

    @staticmethod
    def random_sample_ratio(img_scale, ratio_range):
        min_ratio, max_ratio = ratio_range
        assert min_ratio <= max_ratio
        ratio = np.random.random_sample() * (max_ratio - min_ratio) + min_ratio
        scale = int(img_scale[0] * ratio), int(img_scale[1] * ratio)
        return scale, None

    def _random_scale(self, results):
        if self.ratio_range is not None:
            if self.img_scale is None:
                h, w = results['img'].shape[:2]
                scale, scale_idx = self.random_sample_ratio((w, h),
                                                            self.ratio_range)
            else:
                scale, scale_idx = self.random_sample_ratio(
                    self.img_scale[0], self.ratio_range)
        elif len(self.img_scale) == 1:
            scale, scale_idx = self.img_scale[0], 0
        elif self.multiscale_mode == 'range':
            scale, scale_idx = self.random_sample(self.img_scale)
        else:
            scale, scale_idx = self.random_select(self.img_scale)
        results['scale'] = scale
        results['scale_idx'] = scale_idx

    def _resize_img(self, results):
        img = results['img']
        if self.keep_ratio:
            if self.min_size is not None:
                # scale the short edge up to at least min_size
                if min(results['scale']) < self.min_size:
                    new_short = self.min_size
                else:
                    new_short = min(results['scale'])
                h, w = img.shape[:2]
                if h < w:
                    new_h, new_w = new_short, new_short * w / h
                else:
                    new_h, new_w = new_short * h / w, new_short
                results['scale'] = (int(new_w), int(new_h))
            img, scale_factor = mmimg.imrescale(img, results['scale'],
                                                return_scale=True)
            new_h, new_w = img.shape[:2]
            h, w = results['img'].shape[:2]
            w_scale = new_w / w
            h_scale = new_h / h
        else:
            img, w_scale, h_scale = mmimg.imresize(img, results['scale'],
                                                   return_scale=True)
        scale_factor = np.array([w_scale, h_scale, w_scale, h_scale],
                                dtype=np.float32)
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = scale_factor
        results['keep_ratio'] = self.keep_ratio

    def _resize_seg(self, results):
        for key in results.get('seg_fields', []):
            if self.keep_ratio:
                gt_seg = mmimg.imrescale(results[key], results['scale'],
                                         interpolation='nearest')
            else:
                gt_seg = mmimg.imresize(results[key], results['scale'],
                                        interpolation='nearest')
            results[key] = gt_seg

    def __call__(self, results):
        if 'scale' not in results:
            self._random_scale(results)
        self._resize_img(results)
        self._resize_seg(results)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(img_scale={self.img_scale}, '
                f'multiscale_mode={self.multiscale_mode}, '
                f'ratio_range={self.ratio_range}, '
                f'keep_ratio={self.keep_ratio})')


@PIPELINES.register_module()
class RandomFlip:
    """Random horizontal/vertical flip (reference ``transforms.py:325``).

    Accepts both ``prob`` and the legacy ``flip_ratio`` alias the author's
    configs use (reference ``my_config/STC-UNet.py:33``).
    """

    def __init__(self, prob=None, direction='horizontal', flip_ratio=None):
        if prob is None:
            prob = flip_ratio
        self.prob = prob
        self.direction = direction
        if prob is not None:
            assert 0 <= prob <= 1
        assert direction in ['horizontal', 'vertical']

    def __call__(self, results):
        if 'flip' not in results:
            flip = True if np.random.rand() < self.prob else False
            results['flip'] = flip
        if 'flip_direction' not in results:
            results['flip_direction'] = self.direction
        if results['flip']:
            results['img'] = mmimg.imflip(
                results['img'], direction=results['flip_direction'])
            for key in results.get('seg_fields', []):
                results[key] = mmimg.imflip(
                    results[key], direction=results['flip_direction']).copy()
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(prob={self.prob})'


@PIPELINES.register_module()
class Pad:
    """Pad to fixed size or to a divisor (reference ``transforms.py:380``)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        assert size is not None or size_divisor is not None
        assert size is None or size_divisor is None

    def _pad_img(self, results):
        if self.size is not None:
            padded_img = mmimg.impad(results['img'], shape=self.size,
                                     pad_val=self.pad_val)
        else:
            padded_img = mmimg.impad_to_multiple(
                results['img'], self.size_divisor, pad_val=self.pad_val)
        results['img'] = padded_img
        results['pad_shape'] = padded_img.shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor

    def _pad_seg(self, results):
        for key in results.get('seg_fields', []):
            results[key] = mmimg.impad(results[key],
                                       shape=results['pad_shape'][:2],
                                       pad_val=self.seg_pad_val)

    def __call__(self, results):
        self._pad_img(results)
        self._pad_seg(results)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(size={self.size}, '
                f'size_divisor={self.size_divisor}, pad_val={self.pad_val})')


@PIPELINES.register_module()
class Normalize:
    """Normalize the image (reference ``transforms.py:451``)."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.array(mean, dtype=np.float32)
        self.std = np.array(std, dtype=np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        results['img'] = mmimg.imnormalize(results['img'], self.mean,
                                           self.std, self.to_rgb)
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(mean={list(self.mean)}, '
                f'std={list(self.std)}, to_rgb={self.to_rgb})')


@PIPELINES.register_module()
class Rerange:
    """Linear rescale of pixel values to [min_value, max_value]
    (reference ``transforms.py:493``)."""

    def __init__(self, min_value=0, max_value=255):
        assert isinstance(min_value, (float, int))
        assert isinstance(max_value, (float, int))
        assert min_value < max_value
        self.min_value = min_value
        self.max_value = max_value

    def __call__(self, results):
        img = results['img']
        img_min_value = np.min(img)
        img_max_value = np.max(img)
        assert img_min_value < img_max_value
        img = (img - img_min_value) / (img_max_value - img_min_value)
        results['img'] = img * (self.max_value - self.min_value) + \
            self.min_value
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(min_value={self.min_value}, '
                f'max_value={self.max_value})')


@PIPELINES.register_module()
class CLAHE:
    """Contrast-limited adaptive histogram equalization per channel
    (reference ``transforms.py:539``)."""

    def __init__(self, clip_limit=40.0, tile_grid_size=(8, 8)):
        assert isinstance(clip_limit, (float, int))
        self.clip_limit = clip_limit
        assert isinstance(tile_grid_size, tuple) and all(
            isinstance(t, int) for t in tile_grid_size)
        assert len(tile_grid_size) == 2
        self.tile_grid_size = tile_grid_size

    def __call__(self, results):
        img = results['img']
        for i in range(img.shape[2]):
            img[:, :, i] = mmimg.clahe(
                np.array(img[:, :, i], dtype=np.uint8), self.clip_limit,
                self.tile_grid_size)
        results['img'] = img
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(clip_limit={self.clip_limit}, '
                f'tile_grid_size={self.tile_grid_size})')


@PIPELINES.register_module()
class RandomCrop:
    """Random crop with category-dominance rejection
    (reference ``transforms.py:584-651``): retry up to 10 times until no
    single class (excluding ignore) exceeds ``cat_max_ratio``."""

    def __init__(self, crop_size, cat_max_ratio=1., ignore_index=255):
        assert crop_size[0] > 0 and crop_size[1] > 0
        self.crop_size = crop_size
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def get_crop_bbox(self, img):
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        offset_h = np.random.randint(0, margin_h + 1)
        offset_w = np.random.randint(0, margin_w + 1)
        crop_y1, crop_y2 = offset_h, offset_h + self.crop_size[0]
        crop_x1, crop_x2 = offset_w, offset_w + self.crop_size[1]
        return crop_y1, crop_y2, crop_x1, crop_x2

    @staticmethod
    def crop(img, crop_bbox):
        crop_y1, crop_y2, crop_x1, crop_x2 = crop_bbox
        return img[crop_y1:crop_y2, crop_x1:crop_x2, ...]

    def __call__(self, results):
        img = results['img']
        crop_bbox = self.get_crop_bbox(img)
        if self.cat_max_ratio < 1.:
            for _ in range(10):
                seg_temp = self.crop(results['gt_semantic_seg'], crop_bbox)
                labels, cnt = np.unique(seg_temp, return_counts=True)
                cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and np.max(cnt) / np.sum(cnt) < \
                        self.cat_max_ratio:
                    break
                crop_bbox = self.get_crop_bbox(img)
        img = self.crop(img, crop_bbox)
        results['img'] = img
        results['img_shape'] = img.shape
        for key in results.get('seg_fields', []):
            results[key] = self.crop(results[key], crop_bbox)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(crop_size={self.crop_size})'


@PIPELINES.register_module()
class RandomRotate:
    """Random rotation (reference ``transforms.py:657``)."""

    def __init__(self, prob, degree, pad_val=0, seg_pad_val=255, center=None,
                 auto_bound=False):
        self.prob = prob
        assert 0 <= prob <= 1
        if isinstance(degree, (float, int)):
            assert degree > 0
            self.degree = (-degree, degree)
        else:
            self.degree = degree
        assert len(self.degree) == 2
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center
        self.auto_bound = auto_bound

    def __call__(self, results):
        rotate = True if np.random.rand() < self.prob else False
        degree = np.random.uniform(min(*self.degree), max(*self.degree))
        if rotate:
            results['img'] = mmimg.imrotate(
                results['img'], angle=degree, border_value=self.pad_val,
                center=self.center, auto_bound=self.auto_bound)
            for key in results.get('seg_fields', []):
                results[key] = mmimg.imrotate(
                    results[key], angle=degree,
                    border_value=self.seg_pad_val, center=self.center,
                    auto_bound=self.auto_bound,
                    interpolation='nearest')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(prob={self.prob}, '
                f'degree={self.degree})')


@PIPELINES.register_module()
class RGB2Gray:
    """Weighted channel-sum grayscale (reference ``transforms.py:740``)."""

    def __init__(self, out_channels=None, weights=(0.299, 0.587, 0.114)):
        assert out_channels is None or out_channels > 0
        self.out_channels = out_channels
        assert isinstance(weights, tuple)
        self.weights = weights

    def __call__(self, results):
        img = results['img']
        assert len(img.shape) == 3
        assert img.shape[2] == len(self.weights)
        weights = np.array(self.weights).reshape((1, 1, -1))
        img = (img * weights).sum(2, keepdims=True)
        if self.out_channels is None:
            img = img.repeat(weights.shape[2], axis=2)
        else:
            img = img.repeat(self.out_channels, axis=2)
        results['img'] = img
        results['img_shape'] = img.shape
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(out_channels={self.out_channels},'
                f' weights={self.weights})')


@PIPELINES.register_module()
class AdjustGamma:
    """Gamma LUT correction (reference ``transforms.py:795``)."""

    def __init__(self, gamma=1.0):
        assert isinstance(gamma, (float, int))
        assert gamma > 0
        self.gamma = float(gamma)

    def __call__(self, results):
        results['img'] = mmimg.adjust_gamma(
            np.array(results['img'], dtype=np.uint8), self.gamma)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(gamma={self.gamma})'


@PIPELINES.register_module()
class SegRescale:
    """Rescale only the seg maps (reference ``transforms.py:831``)."""

    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in results.get('seg_fields', []):
            if self.scale_factor != 1:
                results[key] = mmimg.imrescale(
                    results[key], self.scale_factor,
                    interpolation='nearest')
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(scale_factor={self.scale_factor})'


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Brightness/contrast/saturation/hue jitter, each with p=0.5
    (reference ``transforms.py:861``): brightness → (maybe contrast) →
    saturation → hue → (maybe contrast), contrast position random."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def convert(self, img, alpha=1, beta=0):
        img = img.astype(np.float32) * alpha + beta
        img = np.clip(img, 0, 255)
        return img.astype(np.uint8)

    def brightness(self, img):
        if np.random.randint(2):
            return self.convert(
                img,
                beta=np.random.uniform(-self.brightness_delta,
                                       self.brightness_delta))
        return img

    def contrast(self, img):
        if np.random.randint(2):
            return self.convert(
                img,
                alpha=np.random.uniform(self.contrast_lower,
                                        self.contrast_upper))
        return img

    def saturation(self, img):
        if np.random.randint(2):
            img = mmimg.bgr2hsv(img)
            img[:, :, 1] = self.convert(
                img[:, :, 1],
                alpha=np.random.uniform(self.saturation_lower,
                                        self.saturation_upper))
            img = mmimg.hsv2bgr(img)
        return img

    def hue(self, img):
        if np.random.randint(2):
            img = mmimg.bgr2hsv(img)
            img[:, :, 0] = (
                img[:, :, 0].astype(int) +
                np.random.randint(-self.hue_delta, self.hue_delta)) % 180
            img = mmimg.hsv2bgr(img)
        return img

    def __call__(self, results):
        img = results['img']
        img = self.brightness(img)
        mode = np.random.randint(2)
        if mode == 1:
            img = self.contrast(img)
        img = self.saturation(img)
        img = self.hue(img)
        if mode == 0:
            img = self.contrast(img)
        results['img'] = img
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}'
                f'(brightness_delta={self.brightness_delta}, '
                f'contrast_range=({self.contrast_lower}, '
                f'{self.contrast_upper}), '
                f'saturation_range=({self.saturation_lower}, '
                f'{self.saturation_upper}), hue_delta={self.hue_delta})')


@PIPELINES.register_module()
class RandomCutOut:
    """Random rectangular dropout (reference ``transforms.py:980``)."""

    def __init__(self, prob, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0), seg_fill_in=None):
        assert 0 <= prob and prob <= 1
        assert (cutout_shape is None) ^ (cutout_ratio is None), \
            'Either cutout_shape or cutout_ratio should be specified.'
        assert (isinstance(cutout_shape, (list, tuple))
                or isinstance(cutout_ratio, (list, tuple)))
        if isinstance(n_holes, tuple):
            assert len(n_holes) == 2 and 0 <= n_holes[0] < n_holes[1]
        if seg_fill_in is not None:
            assert (isinstance(seg_fill_in, int) and 0 <= seg_fill_in
                    and seg_fill_in <= 255)
        self.prob = prob
        self.n_holes = n_holes if isinstance(n_holes, tuple) else (n_holes,
                                                                   n_holes)
        self.fill_in = fill_in
        self.seg_fill_in = seg_fill_in
        self.with_ratio = cutout_ratio is not None
        candidates = cutout_ratio if self.with_ratio else cutout_shape
        self.candidates = candidates if isinstance(candidates, list) else \
            [candidates]

    def __call__(self, results):
        if np.random.rand() > self.prob:
            return results
        h, w, _ = results['img'].shape
        n_holes = np.random.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n_holes):
            x1 = np.random.randint(0, w)
            y1 = np.random.randint(0, h)
            index = np.random.randint(0, len(self.candidates))
            if not self.with_ratio:
                cutout_w, cutout_h = self.candidates[index]
            else:
                cutout_w = int(self.candidates[index][0] * w)
                cutout_h = int(self.candidates[index][1] * h)
            x2 = np.clip(x1 + cutout_w, 0, w)
            y2 = np.clip(y1 + cutout_h, 0, h)
            results['img'][y1:y2, x1:x2, :] = self.fill_in
            if self.seg_fill_in is not None:
                for key in results.get('seg_fields', []):
                    results[key][y1:y2, x1:x2] = self.seg_fill_in
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(prob={self.prob}, '
                f'n_holes={self.n_holes})')


@PIPELINES.register_module()
class RandomMosaic:
    """4-image mosaic mix (reference ``transforms.py:1072``); requires
    :class:`~stc_unet_tpu.datasets.dataset_wrappers.MultiImageMixDataset`."""

    def __init__(self, prob, img_scale=(640, 640),
                 center_ratio_range=(0.5, 1.5), pad_val=0, seg_pad_val=255):
        assert 0 <= prob and prob <= 1
        assert isinstance(img_scale, tuple)
        self.prob = prob
        self.img_scale = img_scale  # (h, w) — mmseg mosaic convention
        self.center_ratio_range = center_ratio_range
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def get_indexes(self, dataset):
        return [np.random.randint(0, len(dataset)) for _ in range(3)]

    def __call__(self, results):
        self.mosaic = True if np.random.rand() < self.prob else False
        if self.mosaic:
            results = self._mosaic_transform_img(results)
            results = self._mosaic_transform_seg(results)
        return results

    def _mosaic_combine(self, loc, center_position_xy, img_shape_wh):
        assert loc in ('top_left', 'top_right', 'bottom_left', 'bottom_right')
        if loc == 'top_left':
            x1, y1, x2, y2 = (max(center_position_xy[0] - img_shape_wh[0], 0),
                              max(center_position_xy[1] - img_shape_wh[1], 0),
                              center_position_xy[0], center_position_xy[1])
            crop_coord = img_shape_wh[0] - (x2 - x1), img_shape_wh[1] - (
                y2 - y1), img_shape_wh[0], img_shape_wh[1]
        elif loc == 'top_right':
            x1, y1, x2, y2 = (center_position_xy[0],
                              max(center_position_xy[1] - img_shape_wh[1], 0),
                              min(center_position_xy[0] + img_shape_wh[0],
                                  self.img_scale[1] * 2),
                              center_position_xy[1])
            crop_coord = 0, img_shape_wh[1] - (y2 - y1), min(
                img_shape_wh[0], x2 - x1), img_shape_wh[1]
        elif loc == 'bottom_left':
            x1, y1, x2, y2 = (max(center_position_xy[0] - img_shape_wh[0], 0),
                              center_position_xy[1], center_position_xy[0],
                              min(self.img_scale[0] * 2,
                                  center_position_xy[1] + img_shape_wh[1]))
            crop_coord = img_shape_wh[0] - (x2 - x1), 0, img_shape_wh[0], min(
                y2 - y1, img_shape_wh[1])
        else:
            x1, y1, x2, y2 = (center_position_xy[0], center_position_xy[1],
                              min(center_position_xy[0] + img_shape_wh[0],
                                  self.img_scale[1] * 2),
                              min(self.img_scale[0] * 2,
                                  center_position_xy[1] + img_shape_wh[1]))
            crop_coord = 0, 0, min(img_shape_wh[0],
                                   x2 - x1), min(y2 - y1, img_shape_wh[1])
        return (x1, y1, x2, y2), crop_coord

    def _mosaic_single(self, results, key, pad_val, is_seg):
        mosaic_h = int(self.img_scale[0] * 2)
        mosaic_w = int(self.img_scale[1] * 2)
        base = results[key] if not is_seg else results[key]
        if not is_seg and len(base.shape) == 3:
            canvas = np.full((mosaic_h, mosaic_w, base.shape[2]), pad_val,
                             dtype=base.dtype)
        else:
            canvas = np.full((mosaic_h, mosaic_w), pad_val, dtype=base.dtype)
        center_x = int(np.random.uniform(*self.center_ratio_range) *
                       self.img_scale[1])
        center_y = int(np.random.uniform(*self.center_ratio_range) *
                       self.img_scale[0])
        center_position = (center_x, center_y)
        loc_strs = ('top_left', 'top_right', 'bottom_left', 'bottom_right')
        for i, loc in enumerate(loc_strs):
            if loc == 'top_left':
                result_patch = results
            else:
                result_patch = results['mix_results'][i - 1]
            patch = result_patch[key]
            hi, wi = patch.shape[:2]
            scale_ratio = min(self.img_scale[0] / hi, self.img_scale[1] / wi)
            patch = mmimg.imresize(
                patch, (int(wi * scale_ratio), int(hi * scale_ratio)),
                interpolation='nearest' if is_seg else 'bilinear')
            paste_coord, crop_coord = self._mosaic_combine(
                loc, center_position, patch.shape[:2][::-1])
            x1_p, y1_p, x2_p, y2_p = paste_coord
            x1_c, y1_c, x2_c, y2_c = crop_coord
            canvas[y1_p:y2_p, x1_p:x2_p] = patch[y1_c:y2_c, x1_c:x2_c]
        return canvas

    def _mosaic_transform_img(self, results):
        assert 'mix_results' in results
        self.center_position = None
        # freeze one center for both img and seg passes
        state = np.random.get_state()
        results['img'] = self._mosaic_single(results, 'img', self.pad_val,
                                             is_seg=False)
        self._saved_state = state
        results['img_shape'] = results['img'].shape
        results['ori_shape'] = results['img'].shape
        return results

    def _mosaic_transform_seg(self, results):
        for key in results.get('seg_fields', []):
            np.random.set_state(self._saved_state)
            results[key] = self._mosaic_single(results, key,
                                               self.seg_pad_val, is_seg=True)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(prob={self.prob}, '
                f'img_scale={self.img_scale})')
