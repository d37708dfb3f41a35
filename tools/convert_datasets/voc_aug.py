"""Merge SBD (VOC aug) annotations into the VOC2012 layout
(≙ reference ``tools/convert_datasets/voc_aug.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _osp.dirname(_repo_root))
    _sys.path.insert(0, _repo_root)

import argparse
import os

import numpy as np
from PIL import Image

AUG_LEN = 10582


def convert_mat(mat_file, in_dir, out_dir):
    from scipy.io import loadmat
    data = loadmat(_osp.join(in_dir, mat_file))
    mask = data['GTcls'][0]['Segmentation'][0].astype(np.uint8)
    Image.fromarray(mask).save(
        _osp.join(out_dir, mat_file.replace('.mat', '.png')))


def main():
    parser = argparse.ArgumentParser(
        description='Convert PASCAL VOC aug (SBD) annotations')
    parser.add_argument('devkit_path', help='VOCdevkit path')
    parser.add_argument('aug_path', help='SBD benchmark_RELEASE path')
    parser.add_argument('-o', '--out_dir', help='output path')
    args = parser.parse_args()
    try:
        import scipy  # noqa: F401
    except ImportError:
        raise SystemExit('scipy is required to read SBD .mat files')

    aug_ann_dir = _osp.join(args.aug_path, 'dataset', 'cls')
    out_dir = args.out_dir or _osp.join(args.devkit_path, 'VOC2012',
                                        'SegmentationClassAug')
    os.makedirs(out_dir, exist_ok=True)
    mats = sorted(f for f in os.listdir(aug_ann_dir) if f.endswith('.mat'))
    for m in mats:
        convert_mat(m, aug_ann_dir, out_dir)

    # build trainaug split = SBD train+val ∪ VOC train, minus VOC val
    with open(_osp.join(args.aug_path, 'dataset', 'train.txt')) as f:
        sbd_train = {l.strip() for l in f}
    with open(_osp.join(args.aug_path, 'dataset', 'val.txt')) as f:
        sbd_val = {l.strip() for l in f}
    seg_dir = _osp.join(args.devkit_path, 'VOC2012', 'ImageSets',
                        'Segmentation')
    with open(_osp.join(seg_dir, 'train.txt')) as f:
        voc_train = {l.strip() for l in f}
    with open(_osp.join(seg_dir, 'val.txt')) as f:
        voc_val = {l.strip() for l in f}
    trainaug = sorted((sbd_train | sbd_val | voc_train) - voc_val)
    with open(_osp.join(seg_dir, 'trainaug.txt'), 'w') as f:
        f.writelines(name + '\n' for name in trainaug)
    print(f'Done! trainaug has {len(trainaug)} samples '
          f'(expected ~{AUG_LEN})')


if __name__ == '__main__':
    main()
