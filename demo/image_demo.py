"""Batch image inference demo (≙ reference ``demo/image_demo.py``): run a
model over a directory of images and save binary masks."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import glob
import os

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser(description='Image demo')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', help='checkpoint file')
    parser.add_argument('--img-dir', default='../datasets/test/images',
                        help='directory of input images '
                             '(reference hardcodes this path)')
    parser.add_argument('--out-dir', default='./demo_out')
    parser.add_argument('--device', default=None)
    parser.add_argument('--palette', default='my')
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    from stc_unet_tpu.apis import inference_segmentor, init_segmentor
    model = init_segmentor(args.config, args.checkpoint)
    os.makedirs(args.out_dir, exist_ok=True)
    images = sorted(
        glob.glob(_osp.join(args.img_dir, '*.png')) +
        glob.glob(_osp.join(args.img_dir, '*.jpg')))
    for path in images:
        result = inference_segmentor(model, path)
        mask = np.asarray(result[0]).astype(np.uint8)
        out = _osp.join(args.out_dir,
                        _osp.splitext(_osp.basename(path))[0] + '.png')
        Image.fromarray(mask).save(out)
        print(f'{path} -> {out}')


if __name__ == '__main__':
    main()
