"""Arrange the LoveDA release zips into img_dir/ann_dir splits
(≙ reference ``tools/convert_datasets/loveda.py``).

    python tools/convert_datasets/loveda.py /path/to/loveDA_zips -o data/loveDA
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import shutil
import tempfile
import zipfile


def main():
    parser = argparse.ArgumentParser(
        description='Convert the LoveDA dataset into img_dir/ann_dir layout')
    parser.add_argument('dataset_path', help='folder holding the three zips')
    parser.add_argument('--tmp_dir', help='temporary directory')
    parser.add_argument('-o', '--out_dir', default=osp.join('data', 'loveDA'))
    args = parser.parse_args()

    for split in ('train', 'val', 'test'):
        os.makedirs(osp.join(args.out_dir, 'img_dir', split), exist_ok=True)
        if split != 'test':
            os.makedirs(osp.join(args.out_dir, 'ann_dir', split),
                        exist_ok=True)

    for zname in ('Train.zip', 'Val.zip', 'Test.zip'):
        src = osp.join(args.dataset_path, zname)
        assert osp.exists(src), f'{zname} not found in {args.dataset_path}'
        split = zname[:-4].lower()
        with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
            zipfile.ZipFile(src).extractall(tmp)
            for scene in ('Rural', 'Urban'):
                for kind, sub in (('images_png', 'img_dir'),
                                  ('masks_png', 'ann_dir')):
                    if split == 'test' and kind == 'masks_png':
                        continue
                    pattern = osp.join(tmp, zname[:-4], scene, kind, '*')
                    for f in glob.glob(pattern):
                        shutil.move(f, osp.join(args.out_dir, sub, split))
        print(f'{zname}: done')
    print('Done!')


if __name__ == '__main__':
    main()
