"""Clip ISPRS Vaihingen tiles + eroded ground truth into 512² patches
(≙ reference ``tools/convert_datasets/vaihingen.py``).

Label files are the ``*_noBoundary.tif`` eroded ground truth; output ids are
1-based (datasets load with ``reduce_zero_label=True``; boundary → 0).
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
    'train': ['area1', 'area11', 'area13', 'area15', 'area17', 'area21',
              'area23', 'area26', 'area28', 'area3', 'area30', 'area32',
              'area34', 'area37', 'area5', 'area7'],
    'val': ['area6', 'area24', 'area35', 'area16', 'area14', 'area22',
            'area10', 'area4', 'area2', 'area20', 'area8', 'area31',
            'area33', 'area27', 'area38', 'area12', 'area29'],
}


def main():
    parser = argparse.ArgumentParser(
        description='Clip Vaihingen tiles into training patches')
    parser.add_argument('dataset_path', help='folder holding the zips')
    parser.add_argument('--tmp_dir', help='temporary directory')
    parser.add_argument('-o', '--out_dir',
                        default=osp.join('data', 'vaihingen'))
    parser.add_argument('--clip_size', type=int, default=512)
    args = parser.parse_args()

    for split in ('train', 'val'):
        os.makedirs(osp.join(args.out_dir, 'img_dir', split), exist_ok=True)
        os.makedirs(osp.join(args.out_dir, 'ann_dir', split), exist_ok=True)

    for z in glob.glob(osp.join(args.dataset_path, '*.zip')):
        with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
            zipfile.ZipFile(z).extractall(tmp)
            tifs = glob.glob(osp.join(tmp, '*.tif')) + \
                glob.glob(osp.join(tmp, 'top', '*.tif'))
            for src in tifs:
                base = osp.basename(src)
                area = base.split('_')[3].split('.')[0].replace(
                    '_noBoundary', '')
                area = area.replace('noBoundary', '')
                if area == 'area9':  # unused ground-truth tile
                    continue
                split = 'train' if area in SPLITS['train'] else 'val'
                to_label = 'noBoundary' in base
                sub = 'ann_dir' if to_label else 'img_dir'
                dst = osp.join(args.out_dir, sub, split)
                img = np.asarray(Image.open(src).convert('RGB'))
                if to_label:
                    img = isprs_label(img)
                clip_big_image(
                    img, args.clip_size,
                    lambda x0, y0, x1, y1:
                        f'{area}_{x0}_{y0}_{x1}_{y1}.png',
                    lambda tile, name:
                        write_png(osp.join(dst, name), tile))
                print(f'{base} -> {sub}/{split}')
    print('Done!')


if __name__ == '__main__':
    main()
