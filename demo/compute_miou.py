"""Standalone Dice/mIoU over predicted-mask directories
(≙ reference ``demo/compute_miou.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import glob
import os

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser(
        description='Compute Dice/mIoU between prediction and label dirs')
    parser.add_argument('pred_dir')
    parser.add_argument('label_dir')
    parser.add_argument('--num-classes', type=int, default=2)
    args = parser.parse_args()

    from stc_unet_tpu.core import eval_metrics
    preds, gts = [], []
    for p in sorted(glob.glob(_osp.join(args.pred_dir, '*.png'))):
        g = _osp.join(args.label_dir, _osp.basename(p))
        if not _osp.exists(g):
            continue
        preds.append(np.array(Image.open(p)))
        gts.append(np.array(Image.open(g)))
    metrics = eval_metrics(preds, gts, args.num_classes, ignore_index=255,
                           metrics=['mIoU', 'mDice'])
    print(f"aAcc: {metrics['aAcc']:.4f}")
    print(f"mIoU: {np.nanmean(metrics['IoU']):.4f}")
    print(f"mDice: {np.nanmean(metrics['Dice']):.4f}")
    for i, (iou, dice) in enumerate(zip(metrics['IoU'], metrics['Dice'])):
        print(f'class {i}: IoU={iou:.4f} Dice={dice:.4f}')


if __name__ == '__main__':
    main()
