"""Confusion matrix from prediction results
(≙ reference ``tools/confusion_matrix.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import pickle

import numpy as np

from stc_unet_tpu.datasets import build_dataset
from stc_unet_tpu.utils import Config


def parse_args():
    parser = argparse.ArgumentParser(
        description='Generate confusion matrix from segmentation results')
    parser.add_argument('config', help='test config file path')
    parser.add_argument('prediction_path',
                        help='prediction path (pkl of label maps)')
    parser.add_argument('save_dir', help='directory to save the matrix plot')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--color-theme', default='winter')
    parser.add_argument('--title', default='Normalized Confusion Matrix')
    parser.add_argument('--cfg-options', nargs='+')
    return parser.parse_args()


def calculate_confusion_matrix(dataset, results):
    n = len(dataset.CLASSES)
    confusion_matrix = np.zeros(shape=[n, n])
    assert len(dataset) == len(results)
    for idx, per_img_res in enumerate(results):
        res_segm = np.asarray(per_img_res)
        gt_segm = dataset.get_gt_seg_map_by_idx(idx).astype(int)
        inds = n * gt_segm + res_segm
        inds = inds[gt_segm < n]
        mat = np.bincount(inds.astype(int), minlength=n**2).reshape(n, n)
        confusion_matrix += mat
    return confusion_matrix


def plot_confusion_matrix(confusion_matrix, labels, save_dir=None,
                          show=False, title='Normalized Confusion Matrix',
                          color_theme='winter'):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    per_label_sums = confusion_matrix.sum(axis=1)[:, np.newaxis]
    confusion_matrix = confusion_matrix.astype(np.float32) / \
        np.maximum(per_label_sums, 1) * 100
    num_classes = len(labels)
    fig, ax = plt.subplots(
        figsize=(2 * num_classes + 4, 2 * num_classes), dpi=45)
    cmap = plt.get_cmap(color_theme)
    im = ax.imshow(confusion_matrix, cmap=cmap)
    plt.colorbar(mappable=im, ax=ax)
    ax.set_title(title)
    ax.set_xlabel('Prediction Label')
    ax.set_ylabel('Ground Truth Label')
    ax.set_xticks(np.arange(num_classes))
    ax.set_yticks(np.arange(num_classes))
    ax.set_xticklabels(labels, rotation=45, ha='right')
    ax.set_yticklabels(labels)
    for i in range(num_classes):
        for j in range(num_classes):
            ax.text(j, i, f'{confusion_matrix[i, j]:.2f}%',
                    ha='center', va='center', color='w', size=7)
    fig.tight_layout()
    if save_dir is not None:
        import os
        os.makedirs(save_dir, exist_ok=True)
        plt.savefig(_osp.join(save_dir, 'confusion_matrix.png'),
                    format='png')
        print(f'saved to {save_dir}/confusion_matrix.png')
    if show:  # pragma: no cover
        plt.show()
    plt.close()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    with open(args.prediction_path, 'rb') as f:
        results = pickle.load(f)
    cfg.data.test['test_mode'] = True
    dataset = build_dataset(cfg.data.test)
    confusion_matrix = calculate_confusion_matrix(dataset, results)
    plot_confusion_matrix(confusion_matrix, dataset.CLASSES,
                          save_dir=args.save_dir, show=args.show,
                          title=args.title, color_theme=args.color_theme)


if __name__ == '__main__':
    main()
