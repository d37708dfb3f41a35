"""Host-side image ops (≙ the mmcv image module the reference's pipelines use).

The reference's data pipeline calls mmcv's C/SIMD-backed ``imread/imresize/
impad/imnormalize/imrotate...`` (external dep). Rebuilt here on cv2/numpy —
this is CPU-side data loading work that feeds device batches; the device
compute path never sees these (SURVEY.md §2.10).

Conventions follow mmcv: images are BGR uint8 HWC from ``imread``; ``size``
arguments are (w, h) tuples; interpolation names map to cv2 flags.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple, Union

import cv2
import numpy as np

interp_codes = {
    'nearest': cv2.INTER_NEAREST,
    'bilinear': cv2.INTER_LINEAR,
    'bicubic': cv2.INTER_CUBIC,
    'area': cv2.INTER_AREA,
    'lanczos': cv2.INTER_LANCZOS4,
}


def imread(path, flag: str = 'color', channel_order: str = 'bgr',
           backend: str = 'cv2') -> np.ndarray:
    """Read an image as BGR uint8 HWC (grayscale → (H, W))."""
    if isinstance(path, np.ndarray):
        return path
    if not osp.isfile(path):
        raise FileNotFoundError(f'img file does not exist: {path}')
    if backend == 'pillow':
        from PIL import Image
        img = np.array(Image.open(path))
        if flag == 'unchanged':
            return img
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        elif img.shape[2] >= 3:
            img = img[:, :, :3][:, :, ::-1]  # RGB→BGR
        if channel_order == 'rgb':
            img = img[:, :, ::-1]
        return np.ascontiguousarray(img)
    flags = {'color': cv2.IMREAD_COLOR, 'grayscale': cv2.IMREAD_GRAYSCALE,
             'unchanged': cv2.IMREAD_UNCHANGED}[flag]
    img = cv2.imread(path, flags)
    if img is None:
        raise IOError(f'Failed to read image: {path}')
    if channel_order == 'rgb' and img.ndim == 3:
        img = img[:, :, ::-1].copy()
    return img


def imwrite(img: np.ndarray, path: str) -> bool:
    import os
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    return cv2.imwrite(path, img)


def imresize(img: np.ndarray, size: Tuple[int, int],
             return_scale: bool = False, interpolation: str = 'bilinear'):
    """Resize to ``size`` = (w, h) — mmcv argument order."""
    h, w = img.shape[:2]
    resized = cv2.resize(img, size, interpolation=interp_codes[interpolation])
    if not return_scale:
        return resized
    w_scale = size[0] / w
    h_scale = size[1] / h
    return resized, w_scale, h_scale


def rescale_size(old_size: Tuple[int, int], scale,
                 return_scale: bool = False):
    """New (w, h) after scaling with aspect kept (mmcv ``rescale_size``)."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    elif isinstance(scale, (tuple, list)):
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    else:
        raise TypeError(f'Scale must be number or tuple of int, got {scale}')
    new_size = (int(w * scale_factor + 0.5), int(h * scale_factor + 0.5))
    if return_scale:
        return new_size, scale_factor
    return new_size


def imrescale(img: np.ndarray, scale, return_scale: bool = False,
              interpolation: str = 'bilinear'):
    """Resize keeping aspect so the image fits in ``scale`` (mmcv rule)."""
    h, w = img.shape[:2]
    new_size, scale_factor = rescale_size((w, h), scale, return_scale=True)
    rescaled = imresize(img, new_size, interpolation=interpolation)
    if return_scale:
        return rescaled, scale_factor
    return rescaled


def imflip(img: np.ndarray, direction: str = 'horizontal') -> np.ndarray:
    assert direction in ('horizontal', 'vertical', 'diagonal')
    if direction == 'horizontal':
        return np.flip(img, axis=1)
    if direction == 'vertical':
        return np.flip(img, axis=0)
    return np.flip(img, axis=(0, 1))


def impad(img: np.ndarray, *, shape=None, padding=None, pad_val=0,
          padding_mode: str = 'constant') -> np.ndarray:
    """Pad to ``shape`` = (h, w) (bottom/right) or by explicit ``padding``
    = (left, top, right, bottom) — mmcv semantics."""
    assert (shape is not None) ^ (padding is not None)
    if shape is not None:
        width = max(shape[1] - img.shape[1], 0)
        height = max(shape[0] - img.shape[0], 0)
        padding = (0, 0, width, height)
    if isinstance(padding, (int, np.integer)):
        padding = (padding, padding, padding, padding)
    elif len(padding) == 2:
        padding = (padding[0], padding[1], padding[0], padding[1])
    border_type = {'constant': cv2.BORDER_CONSTANT,
                   'edge': cv2.BORDER_REPLICATE,
                   'reflect': cv2.BORDER_REFLECT_101,
                   'symmetric': cv2.BORDER_REFLECT}[padding_mode]
    return cv2.copyMakeBorder(img, padding[1], padding[3], padding[0],
                              padding[2], border_type, value=pad_val)


def impad_to_multiple(img: np.ndarray, divisor: int,
                      pad_val=0) -> np.ndarray:
    pad_h = int(np.ceil(img.shape[0] / divisor)) * divisor
    pad_w = int(np.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(pad_h, pad_w), pad_val=pad_val)


def imnormalize(img: np.ndarray, mean, std, to_rgb: bool = True) -> np.ndarray:
    """(img - mean) / std in float32; optional BGR→RGB first."""
    img = img.astype(np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if to_rgb and img.ndim == 3 and img.shape[2] == 3:
        img = img[:, :, ::-1]
    return (img - mean) / std


def imdenormalize(img, mean, std, to_bgr: bool = True):
    img = img * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    if to_bgr and img.ndim == 3 and img.shape[2] == 3:
        img = img[:, :, ::-1]
    return img


def imrotate(img: np.ndarray, angle: float, center=None, scale: float = 1.0,
             border_value=0, interpolation: str = 'bilinear',
             auto_bound: bool = False) -> np.ndarray:
    """Rotate counter-clockwise by ``angle`` degrees (mmcv semantics)."""
    if center is not None and auto_bound:
        raise ValueError('`auto_bound` conflicts with `center`')
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, scale)
    if auto_bound:
        cos = np.abs(matrix[0, 0])
        sin = np.abs(matrix[0, 1])
        new_w = h * sin + w * cos
        new_h = h * cos + w * sin
        matrix[0, 2] += (new_w - w) * 0.5
        matrix[1, 2] += (new_h - h) * 0.5
        w = int(np.round(new_w))
        h = int(np.round(new_h))
    return cv2.warpAffine(img, matrix, (w, h),
                          flags=interp_codes[interpolation],
                          borderValue=border_value)


def bgr2hsv(img: np.ndarray) -> np.ndarray:
    return cv2.cvtColor(img, cv2.COLOR_BGR2HSV)


def hsv2bgr(img: np.ndarray) -> np.ndarray:
    return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)


def bgr2gray(img: np.ndarray, keepdim: bool = False) -> np.ndarray:
    out = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    if keepdim:
        out = out[..., None]
    return out


def rgb2gray(img: np.ndarray, keepdim: bool = False) -> np.ndarray:
    out = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    if keepdim:
        out = out[..., None]
    return out


def clahe(img: np.ndarray, clip_limit: float = 40.0,
          tile_grid_size=(8, 8)) -> np.ndarray:
    c = cv2.createCLAHE(clip_limit, tuple(tile_grid_size))
    return c.apply(np.asarray(img, np.uint8))


def adjust_gamma(img: np.ndarray, gamma: float = 1.0) -> np.ndarray:
    assert isinstance(gamma, float)
    inv_gamma = 1.0 / gamma
    table = np.array([(i / 255.0)**inv_gamma * 255
                      for i in np.arange(256)]).astype('uint8')
    return cv2.LUT(np.asarray(img, np.uint8), table)
