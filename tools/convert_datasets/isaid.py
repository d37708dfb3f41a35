"""Convert iSAID: slide-crop huge aerial images into overlapping patches and
map color semantic masks to class indices
(≙ reference ``tools/convert_datasets/isaid.py``).

Patch name: ``{base}_{y0}_{y1}_{x0}_{x1}.png``; labels keep the
``_instance_color_RGB`` infix that ``iSAIDDataset`` expects as its
``seg_map_suffix``.
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import shutil
import sys
import tempfile
import zipfile

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from _tiling import pad_to, rgb_to_index, slide_starts, write_png  # noqa

ISAID_COLORS = [  # index = class id (0 = background)
    (0, 0, 0), (0, 0, 63), (0, 63, 63), (0, 63, 0), (0, 63, 127),
    (0, 63, 191), (0, 63, 255), (0, 127, 63), (0, 127, 127), (0, 0, 127),
    (0, 0, 191), (0, 0, 255), (0, 191, 127), (0, 127, 191), (0, 127, 255),
    (0, 100, 155),
]


def _crop_all(arr, patch_h, patch_w, overlap, emit):
    h, w = arr.shape[:2]
    for y0, y1 in slide_starts(h, patch_h, overlap):
        for x0, x1 in slide_starts(w, patch_w, overlap):
            emit(arr[y0:y1, x0:x1], y0, y1, x0, x1)


def main():
    parser = argparse.ArgumentParser(
        description='Convert iSAID into cropped img_dir/ann_dir patches')
    parser.add_argument('dataset_path',
                        help='iSAID root with train/val/test zip folders')
    parser.add_argument('--tmp_dir', help='temporary directory')
    parser.add_argument('-o', '--out_dir', default=osp.join('data', 'iSAID'))
    parser.add_argument('--patch_width', type=int, default=896)
    parser.add_argument('--patch_height', type=int, default=896)
    parser.add_argument('--overlap_area', type=int, default=384)
    args = parser.parse_args()

    ph, pw, ov = args.patch_height, args.patch_width, args.overlap_area
    for split in ('train', 'val', 'test'):
        os.makedirs(osp.join(args.out_dir, 'img_dir', split), exist_ok=True)
        os.makedirs(osp.join(args.out_dir, 'ann_dir', split), exist_ok=True)

    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        for split in ('train', 'val', 'test'):
            for z in glob.glob(osp.join(args.dataset_path, split, 'images',
                                        '*.zip')):
                zipfile.ZipFile(z).extractall(osp.join(tmp, split, 'img'))
            imgs = glob.glob(osp.join(tmp, split, 'img', 'images', '*.png'))
            print(f'{split}: {len(imgs)} images')
            for path in imgs:
                if split == 'test':
                    shutil.move(path,
                                osp.join(args.out_dir, 'img_dir', split))
                    continue
                base = osp.splitext(osp.basename(path))[0]
                img = pad_to(np.asarray(Image.open(path).convert('RGB')),
                             ph, pw, 0)
                dst = osp.join(args.out_dir, 'img_dir', split)
                _crop_all(img, ph, pw, ov, lambda t, y0, y1, x0, x1:
                          write_png(osp.join(
                              dst, f'{base}_{y0}_{y1}_{x0}_{x1}.png'), t))
            if split == 'test':
                continue
            for z in glob.glob(osp.join(args.dataset_path, split,
                                        'Semantic_masks', '*.zip')):
                zipfile.ZipFile(z).extractall(osp.join(tmp, split, 'lab'))
            labs = glob.glob(osp.join(tmp, split, 'lab', 'images', '*.png'))
            print(f'{split}: {len(labs)} masks')
            for path in labs:
                stem = osp.basename(path).split('.')[0].split('_')[0]
                lab = rgb_to_index(
                    np.asarray(Image.open(path).convert('RGB')),
                    ISAID_COLORS)
                lab = pad_to(lab, ph, pw, 255)
                dst = osp.join(args.out_dir, 'ann_dir', split)
                _crop_all(lab, ph, pw, ov, lambda t, y0, y1, x0, x1:
                          write_png(osp.join(
                              dst, f'{stem}_{y0}_{y1}_{x0}_{x1}'
                                   f'_instance_color_RGB.png'), t))
    print('Done!')


if __name__ == '__main__':
    main()
