"""Relabel COCO-Stuff 164k masks to contiguous trainIds
(≙ reference ``tools/convert_datasets/coco_stuff164k.py``).

The 182 raw ids minus 11 unused ones → 171 contiguous trainIds (255 kept as
unlabeled). Output: ``annotations/{train,val}2017/*_labelTrainIds.png``.
Uses a 256-entry LUT instead of a per-class masking loop.
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import shutil
from multiprocessing import Pool

import numpy as np
from PIL import Image

# raw ids absent from the 164k label space (0-based)
UNUSED_164K = (11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90)


def build_lut(unused, id_range, offset=0):
    lut = np.full(256, 255, np.uint8)
    tr = 0
    for raw in id_range:
        if raw in unused:
            continue
        lut[raw + offset] = tr
        tr += 1
    lut[255] = 255
    return lut


LUT = build_lut(UNUSED_164K, range(182))


def convert_one(task):
    src, dst = task
    mask = np.asarray(Image.open(src))
    Image.fromarray(LUT[mask]).save(dst, 'PNG')


def main():
    parser = argparse.ArgumentParser(
        description='Generate COCO-Stuff 164k trainId masks')
    parser.add_argument('coco_path', help='coco stuff root')
    parser.add_argument('-o', '--out_dir', help='output root')
    parser.add_argument('--nproc', type=int, default=16)
    args = parser.parse_args()
    out_dir = args.out_dir or args.coco_path

    tasks = []
    for split in ('train2017', 'val2017'):
        dst_dir = osp.join(out_dir, 'annotations', split)
        os.makedirs(dst_dir, exist_ok=True)
        for src in glob.glob(osp.join(args.coco_path, 'annotations', split,
                                      '*.png')):
            if src.endswith('_labelTrainIds.png'):
                continue
            base = osp.splitext(osp.basename(src))[0]
            tasks.append((src, osp.join(dst_dir,
                                        f'{base}_labelTrainIds.png')))
    if out_dir != args.coco_path:
        shutil.copytree(osp.join(args.coco_path, 'images'),
                        osp.join(out_dir, 'images'), dirs_exist_ok=True)
    print(f'{len(tasks)} masks')
    if args.nproc > 1:
        with Pool(args.nproc) as pool:
            pool.map(convert_one, tasks)
    else:
        for t in tasks:
            convert_one(t)
    print('Done!')


if __name__ == '__main__':
    main()
