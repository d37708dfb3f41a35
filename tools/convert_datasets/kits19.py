"""Convert KiTS19 CT volumes to 2-D slice PNGs in the author's layout
(train/images, train/labels, test/images, test/labels — reference
``my_config/STC-UNet.py:56-74``). The reference repo ships no KiTS19
converter (its author pre-sliced offline); this tool fills that gap so the
end-to-end KiTS19 pipeline is reproducible.

Expects the official KiTS19 ``data/case_XXXXX/imaging.nii.gz`` +
``segmentation.nii.gz`` tree; requires nibabel (not bundled — the tool
degrades with a clear message).
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import glob
import os

import numpy as np
from PIL import Image


def parse_args():
    parser = argparse.ArgumentParser(
        description='Slice KiTS19 volumes into png pairs')
    parser.add_argument('kits_dir', help='KiTS19 data dir (case_* subdirs)')
    parser.add_argument('-o', '--out_dir', default='datasets')
    parser.add_argument('--val-split', type=float, default=0.2)
    parser.add_argument('--window', type=float, nargs=2,
                        default=(-200.0, 300.0),
                        help='CT HU window (soft-tissue default)')
    parser.add_argument('--binary', action='store_true', default=True,
                        help='merge kidney+tumor into one foreground class '
                             '(the reference trains 2-class)')
    return parser.parse_args()


def main():
    args = parse_args()
    try:
        import nibabel as nib
    except ImportError:
        raise SystemExit('nibabel is required to read NIfTI volumes: '
                         'pip install nibabel')
    cases = sorted(glob.glob(_osp.join(args.kits_dir, 'case_*')))
    n_val = max(1, int(len(cases) * args.val_split))
    split = {'test': cases[:n_val], 'train': cases[n_val:]}
    lo, hi = args.window
    for part, part_cases in split.items():
        img_dir = _osp.join(args.out_dir, part, 'images')
        lbl_dir = _osp.join(args.out_dir, part, 'labels')
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lbl_dir, exist_ok=True)
        for case in part_cases:
            name = _osp.basename(case)
            vol = nib.load(_osp.join(case, 'imaging.nii.gz')).get_fdata()
            seg = nib.load(_osp.join(case,
                                     'segmentation.nii.gz')).get_fdata()
            vol = np.clip(vol, lo, hi)
            vol = ((vol - lo) / (hi - lo) * 255).astype(np.uint8)
            seg = seg.astype(np.uint8)
            if args.binary:
                seg = (seg > 0).astype(np.uint8)
            for z in range(vol.shape[0]):
                if seg[z].max() == 0 and part == 'train':
                    continue  # skip empty train slices (common practice)
                sl = np.stack([vol[z]] * 3, axis=-1)
                Image.fromarray(sl).save(
                    _osp.join(img_dir, f'{name}_{z:04d}.png'))
                Image.fromarray(seg[z]).save(
                    _osp.join(lbl_dir, f'{name}_{z:04d}.png'))
            print(f'{part}: {name} done')
    print('Done!')


if __name__ == '__main__':
    main()
