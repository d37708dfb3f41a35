"""Visualize the training pipeline output (≙ reference
``tools/browse_dataset.py``): runs the train pipeline and writes image +
mask overlays so augmentations can be inspected."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import os

import numpy as np

from stc_unet_tpu.datasets import build_dataset
from stc_unet_tpu.utils import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Browse a dataset')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--output-dir', default='./browse_out',
                        help='where to save the visualizations')
    parser.add_argument('--show-number', type=int, default=20)
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--show-origin', action='store_true',
                        help='dump the un-augmented images instead')
    return parser.parse_args()


def main():
    args = parse_args()
    import cv2
    cfg = Config.fromfile(args.config)
    if args.show_origin:
        cfg.data.train['pipeline'] = [
            t for t in cfg.data.train['pipeline']
            if t['type'] in ('LoadImageFromFile', 'LoadAnnotations')]
    dataset = build_dataset(cfg.data.train)
    os.makedirs(args.output_dir, exist_ok=True)
    palette = np.array(dataset.PALETTE if dataset.PALETTE is not None
                       else [[0, 0, 0], [255, 0, 0]])
    n = min(args.show_number, len(dataset))
    for i in range(n):
        item = dataset[i]
        img = item['img'] if 'img' in item else None
        seg = item.get('gt_semantic_seg')
        if img is None:
            continue
        img = np.asarray(img)
        if img.dtype != np.uint8:
            lo, hi = img.min(), img.max()
            img = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        if seg is not None:
            seg = np.asarray(seg).astype(int)
            color = palette[np.clip(seg, 0, len(palette) - 1)]
            color[seg == 255] = 0
            img = (img * (1 - args.opacity) +
                   color * args.opacity).astype(np.uint8)
        out = _osp.join(args.output_dir, f'{i}.png')
        cv2.imwrite(out, img[..., ::-1])
        print(f'wrote {out}')


if __name__ == '__main__':
    main()
