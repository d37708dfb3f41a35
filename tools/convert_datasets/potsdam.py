"""Clip ISPRS Potsdam ortho tiles + color labels into 512² training patches
(≙ reference ``tools/convert_datasets/potsdam.py``).

Images land in ``img_dir/{train,val}``, labels (1-based ids; datasets load
with ``reduce_zero_label=True``) in ``ann_dir/{train,val}``.
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import sys
import tempfile
import zipfile

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _tiling import clip_big_image, isprs_label, write_png  # noqa: E402

SPLITS = {
    'train': ['2_10', '2_11', '2_12', '3_10', '3_11', '3_12', '4_10',
              '4_11', '4_12', '5_10', '5_11', '5_12', '6_10', '6_11',
              '6_12', '6_7', '6_8', '6_9', '7_10', '7_11', '7_12', '7_7',
              '7_8', '7_9'],
    'val': ['5_15', '6_15', '6_13', '3_13', '4_14', '6_14', '5_14', '2_13',
            '4_15', '2_14', '5_13', '4_13', '3_14', '7_13'],
}


def main():
    parser = argparse.ArgumentParser(
        description='Clip Potsdam tiles into training patches')
    parser.add_argument('dataset_path', help='folder holding the zips')
    parser.add_argument('--tmp_dir', help='temporary directory')
    parser.add_argument('-o', '--out_dir',
                        default=osp.join('data', 'potsdam'))
    parser.add_argument('--clip_size', type=int, default=512)
    args = parser.parse_args()

    for split in ('train', 'val'):
        os.makedirs(osp.join(args.out_dir, 'img_dir', split), exist_ok=True)
        os.makedirs(osp.join(args.out_dir, 'ann_dir', split), exist_ok=True)

    zips = glob.glob(osp.join(args.dataset_path, '*.zip'))
    print('found zips:', zips)
    for z in zips:
        with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
            zipfile.ZipFile(z).extractall(tmp)
            tifs = glob.glob(osp.join(tmp, '*.tif')) or \
                glob.glob(osp.join(tmp, '*', '*.tif'))
            for src in tifs:
                parts = osp.basename(src).split('_')
                tile_id = f'{parts[2]}_{parts[3]}'
                split = 'train' if tile_id in SPLITS['train'] else 'val'
                to_label = 'label' in osp.basename(src).lower()
                sub = 'ann_dir' if to_label else 'img_dir'
                dst = osp.join(args.out_dir, sub, split)
                img = np.asarray(Image.open(src).convert('RGB'))
                if to_label:
                    img = isprs_label(img)
                clip_big_image(
                    img, args.clip_size,
                    lambda x0, y0, x1, y1:
                        f'{tile_id}_{x0}_{y0}_{x1}_{y1}.png',
                    lambda tile, name:
                        write_png(osp.join(dst, name), tile))
                print(f'{osp.basename(src)} -> {sub}/{split}')
    print('Done!')


if __name__ == '__main__':
    main()
