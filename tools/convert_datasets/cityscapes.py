"""Generate ``*_labelTrainIds.png`` for Cityscapes
(≙ reference ``tools/convert_datasets/cityscapes.py``). Requires
cityscapesscripts; degrades with a clear message."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import glob
import os


def main():
    parser = argparse.ArgumentParser(
        description='Convert Cityscapes annotations to TrainIds')
    parser.add_argument('cityscapes_path', help='cityscapes data path')
    parser.add_argument('--gt-dir', default='gtFine', type=str)
    parser.add_argument('-o', '--out-dir', help='output path')
    parser.add_argument('--nproc', default=1, type=int,
                        help='number of processes')
    args = parser.parse_args()
    try:
        from cityscapesscripts.preparation.json2labelImg import json2labelImg
    except ImportError:
        raise SystemExit('cityscapesscripts is required: '
                         'pip install cityscapesscripts')
    gt_dir = _osp.join(args.cityscapes_path, args.gt_dir)
    poly_files = sorted(glob.glob(
        _osp.join(gt_dir, '**', '*_polygons.json'), recursive=True))
    for poly in poly_files:
        label_file = poly.replace('_polygons.json', '_labelTrainIds.png')
        json2labelImg(poly, label_file, 'trainIds')
        print(label_file)
    split_names = ['train', 'val', 'test']
    out_dir = args.out_dir or args.cityscapes_path
    os.makedirs(out_dir, exist_ok=True)
    for split in split_names:
        filenames = []
        for poly in poly_files:
            if f'/{split}/' in poly:
                filenames.append(
                    _osp.basename(poly).replace('_gtFine_polygons.json', ''))
        with open(_osp.join(out_dir, f'{split}.txt'), 'w') as f:
            f.writelines(f + '\n' for f in filenames)
    print('Done!')


if __name__ == '__main__':
    main()
