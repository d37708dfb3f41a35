"""Convert STARE / CHASE_DB1 / HRF retinal-vessel datasets
(≙ reference ``tools/convert_datasets/{stare,chase_db1,hrf}.py`` — one tool,
three subcommands; same output layout as the reference scripts)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import gzip
import os
import tarfile
import tempfile
import zipfile

import numpy as np
from PIL import Image

TRAIN_LEN = {'stare': 10, 'chase_db1': 8, 'hrf': 15}


def _extract(path, dst):
    if path.endswith('.zip'):
        zipfile.ZipFile(path).extractall(dst)
    elif path.endswith(('.tar', '.tar.gz', '.tgz')):
        tarfile.open(path).extractall(dst)
    elif path.endswith('.gz'):
        out = _osp.join(dst, _osp.basename(path)[:-3])
        with gzip.open(path, 'rb') as f_in, open(out, 'wb') as f_out:
            f_out.write(f_in.read())
    else:
        raise ValueError(f'unsupported archive {path}')


def _save_pairs(files, img_dir, ann_dir, binarize):
    for path in files:
        name = _osp.splitext(_osp.basename(path))[0]
        arr = np.array(Image.open(path))
        if binarize:
            if arr.ndim == 3:
                arr = arr[..., 0]
            Image.fromarray((arr // 128).astype(np.uint8)).save(
                _osp.join(ann_dir, name + '.png'))
        else:
            Image.fromarray(arr).save(_osp.join(img_dir, name + '.png'))


def main():
    parser = argparse.ArgumentParser(
        description='Convert retinal-vessel datasets')
    parser.add_argument('dataset', choices=['stare', 'chase_db1', 'hrf'])
    parser.add_argument('archives', nargs='+',
                        help='image archive(s) then annotation archive(s)')
    parser.add_argument('-o', '--out_dir', default=None)
    parser.add_argument('--tmp_dir', default=None)
    args = parser.parse_args()

    out_dir = args.out_dir or _osp.join('data', args.dataset.upper())
    dirs = {}
    for sub in ['images/training', 'images/validation',
                'annotations/training', 'annotations/validation']:
        d = _osp.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        dirs[sub] = d

    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        for arch in args.archives:
            _extract(arch, tmp)
        import glob
        imgs = sorted(
            glob.glob(_osp.join(tmp, '**', '*.ppm'), recursive=True) +
            glob.glob(_osp.join(tmp, '**', '*.jpg'), recursive=True) +
            glob.glob(_osp.join(tmp, '**', '*.JPG'), recursive=True))
        anns = sorted(
            glob.glob(_osp.join(tmp, '**', '*.ah.ppm'), recursive=True) +
            glob.glob(_osp.join(tmp, '**', '*_1stHO.png'), recursive=True) +
            glob.glob(_osp.join(tmp, '**', '*.tif'), recursive=True))
        imgs = [f for f in imgs if f not in set(anns)]
        n_train = TRAIN_LEN[args.dataset]
        _save_pairs(imgs[:n_train], dirs['images/training'], None, False)
        _save_pairs(imgs[n_train:], dirs['images/validation'], None, False)
        _save_pairs(anns[:n_train], None, dirs['annotations/training'],
                    True)
        _save_pairs(anns[n_train:], None, dirs['annotations/validation'],
                    True)
    print('Done!')


if __name__ == '__main__':
    main()
