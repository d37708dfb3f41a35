"""Shared tile/clip helpers for the remote-sensing dataset converters
(≙ the duplicated ``clip_big_image``/``slide_crop_*`` logic in reference
``tools/convert_datasets/{potsdam,vaihingen,isaid}.py``)."""
from __future__ import annotations

import os.path as osp

import numpy as np


def rgb_to_index(img: np.ndarray, colors) -> np.ndarray:
    """Map an (H, W, 3) color mask to class indices; colors is an ordered
    list of (r, g, b) triples, index = position in the list."""
    img = img.astype(np.int64)
    code = img[..., 0] * 65536 + img[..., 1] * 256 + img[..., 2]
    out = np.zeros(code.shape, np.uint8)
    for idx, (r, g, b) in enumerate(colors):
        out[code == (r * 65536 + g * 256 + b)] = idx
    return out


def tile_starts(dim: int, tile: int):
    """Non-overlapping tile starts covering [0, dim); the last tile is
    shifted flush to the boundary (matches the reference clip output set)."""
    if dim <= tile:
        return [0]
    starts = list(range(0, dim - tile + 1, tile))
    if starts[-1] != dim - tile:
        starts.append(dim - tile)
    return starts


def clip_big_image(image: np.ndarray, clip_size: int, name_fn, save_fn):
    """Clip ``image`` into clip_size² tiles; ``name_fn(x0, y0, x1, y1)`` →
    filename, ``save_fn(tile, filename)`` writes it."""
    h, w = image.shape[:2]
    for y0 in tile_starts(h, clip_size):
        for x0 in tile_starts(w, clip_size):
            y1, x1 = min(y0 + clip_size, h), min(x0 + clip_size, w)
            save_fn(image[y0:y1, x0:x1], name_fn(x0, y0, x1, y1))


def pad_to(img: np.ndarray, min_h: int, min_w: int, pad_val) -> np.ndarray:
    """Bottom/right-pad so both dims reach at least (min_h, min_w)."""
    h, w = img.shape[:2]
    ph, pw = max(min_h - h, 0), max(min_w - w, 0)
    if not ph and not pw:
        return img
    pads = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pads, constant_values=pad_val)


def slide_starts(dim: int, patch: int, overlap: int):
    """Overlapping slide starts (stride = patch - overlap), boundary windows
    shifted back flush (matches the reference iSAID slide loop, deduped)."""
    seen, out = set(), []
    for s in range(0, dim, patch - overlap):
        e = min(s + patch, dim)
        s = e - patch
        if (s, e) not in seen:
            seen.add((s, e))
            out.append((s, e))
    return out


ISPRS_COLORS = [  # RGB; ids 1..6 so reduce_zero_label=True yields the
    (255, 255, 255),  # 1 impervious surface   mmseg class order 0..5
    (0, 0, 255),      # 2 building
    (0, 255, 255),    # 3 low vegetation
    (0, 255, 0),      # 4 tree
    (255, 255, 0),    # 5 car
    (255, 0, 0),      # 6 clutter
]


def isprs_label(img_rgb: np.ndarray) -> np.ndarray:
    """ISPRS color mask (RGB) → ids 0..6 (0 = unmatched/boundary black).

    Matches the reference converter output: 1-based class ids consumed by
    datasets configured with ``reduce_zero_label=True``.
    """
    out = np.zeros(img_rgb.shape[:2], np.uint8)
    code = img_rgb.astype(np.int64) @ np.array([65536, 256, 1])
    for i, (r, g, b) in enumerate(ISPRS_COLORS):
        out[code == (r * 65536 + g * 256 + b)] = i + 1
    return out


def write_png(path: str, arr: np.ndarray):
    from PIL import Image
    Image.fromarray(arr).save(path, 'PNG')


def basename_noext(path: str) -> str:
    return osp.splitext(osp.basename(path))[0]
