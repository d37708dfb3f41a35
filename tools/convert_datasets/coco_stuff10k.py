"""Relabel COCO-Stuff 10k .mat annotations to contiguous trainIds
(≙ reference ``tools/convert_datasets/coco_stuff10k.py``).

10k masks are 1-based (0 = unlabeled); the same 11 unused ids as the 164k
release are squeezed out, keeping ids 1-based so datasets load with
``reduce_zero_label=True``. Also splits images into train2014/test2014 by
the release imageLists.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
from multiprocessing import Pool

import numpy as np
from PIL import Image
from scipy.io import loadmat

from coco_stuff164k import UNUSED_164K, build_lut

# 10k ids are the 164k ids shifted by +1 (0 reserved for unlabeled)
LUT = build_lut(tuple(u + 1 for u in UNUSED_164K), range(1, 183), offset=0)
LUT[0] = 0
# re-pack trainIds to start at 1 (build_lut emitted 0-based)
LUT[1:255] = np.where(LUT[1:255] != 255, LUT[1:255] + 1, 255)


def convert_one(task):
    src_img, src_mat, dst_img, dst_png = task
    shutil.copy(src_img, dst_img)
    mask = loadmat(src_mat)['S'].astype(np.uint8)
    Image.fromarray(LUT[mask]).save(dst_png, 'PNG')


def main():
    parser = argparse.ArgumentParser(
        description='Generate COCO-Stuff 10k trainId masks + split folders')
    parser.add_argument('coco_path', help='cocostuff-10k root')
    parser.add_argument('-o', '--out_dir', help='output root')
    parser.add_argument('--nproc', type=int, default=16)
    args = parser.parse_args()
    out_dir = args.out_dir or args.coco_path

    tasks = []
    for list_name, split in (('train.txt', 'train2014'),
                             ('test.txt', 'test2014')):
        os.makedirs(osp.join(out_dir, 'images', split), exist_ok=True)
        os.makedirs(osp.join(out_dir, 'annotations', split), exist_ok=True)
        with open(osp.join(args.coco_path, 'imageLists', list_name)) as f:
            for line in f:
                base = line.strip()
                if not base:
                    continue
                tasks.append((
                    osp.join(args.coco_path, 'images', base + '.jpg'),
                    osp.join(args.coco_path, 'annotations', base + '.mat'),
                    osp.join(out_dir, 'images', split, base + '.jpg'),
                    osp.join(out_dir, 'annotations', split,
                             base + '_labelTrainIds.png')))
    print(f'{len(tasks)} samples')
    if args.nproc > 1:
        with Pool(args.nproc) as pool:
            pool.map(convert_one, tasks)
    else:
        for t in tasks:
            convert_one(t)
    print('Done!')


if __name__ == '__main__':
    main()
