"""Convert the DRIVE retinal-vessel dataset to the framework layout
(≙ reference ``tools/convert_datasets/drive.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import os
import tempfile
import zipfile

import cv2
import numpy as np
from PIL import Image


def parse_args():
    parser = argparse.ArgumentParser(
        description='Convert DRIVE dataset to the framework format')
    parser.add_argument('training_path', help='training part zip')
    parser.add_argument('testing_path', help='testing part zip')
    parser.add_argument('--tmp_dir', help='temporary directory')
    parser.add_argument('-o', '--out_dir', help='output path')
    return parser.parse_args()


def _mkdirs(out_dir):
    for sub in ['images/training', 'images/validation',
                'annotations/training', 'annotations/validation']:
        os.makedirs(_osp.join(out_dir, sub), exist_ok=True)


def _convert_images(src_dir, dst_dir, strip):
    for name in sorted(os.listdir(src_dir)):
        path = _osp.join(src_dir, name)
        if name.endswith('.gif'):
            img = np.array(Image.open(path))
        else:
            img = cv2.imread(path)
        stem = _osp.splitext(name)[0].replace(strip, '')
        cv2.imwrite(_osp.join(dst_dir, stem + '.png'), img)


def _convert_labels(src_dir, dst_dir, strip):
    for name in sorted(os.listdir(src_dir)):
        gt = np.array(Image.open(_osp.join(src_dir, name)))
        label = (gt[..., 0] if gt.ndim == 3 else gt)
        label = (label // 128).astype(np.uint8)
        stem = _osp.splitext(name)[0].replace(strip, '')
        Image.fromarray(label).save(_osp.join(dst_dir, stem + '.png'))


def main():
    args = parse_args()
    out_dir = args.out_dir or _osp.join('data', 'DRIVE')
    _mkdirs(out_dir)
    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        print('Extracting training.zip...')
        zipfile.ZipFile(args.training_path).extractall(tmp)
        _convert_images(_osp.join(tmp, 'training', 'images'),
                        _osp.join(out_dir, 'images', 'training'),
                        '_training')
        _convert_labels(_osp.join(tmp, 'training', '1st_manual'),
                        _osp.join(out_dir, 'annotations', 'training'),
                        '_manual1')
    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        print('Extracting test.zip...')
        zipfile.ZipFile(args.testing_path).extractall(tmp)
        _convert_images(_osp.join(tmp, 'test', 'images'),
                        _osp.join(out_dir, 'images', 'validation'), '_test')
        manual = _osp.join(tmp, 'test', '1st_manual')
        if _osp.isdir(manual):
            _convert_labels(manual,
                            _osp.join(out_dir, 'annotations', 'validation'),
                            '_manual1')
    print('Done!')


if __name__ == '__main__':
    main()
