"""MyDataset — the author's KiTS19 2-class dataset
(≙ reference ``mmseg/datasets/my_dataset.py:14``)."""
from __future__ import annotations

import os
import os.path as osp

import numpy as np

from .builder import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class MyDataset(CustomDataset):
    """Binary kidney-tumor segmentation: background/target, ``.png`` pairs.

    The reference fixes ``CLASSES=('background', 'target')`` and
    ``PALETTE=[[0,0,0],[1,1,1]]`` (``my_dataset.py:21-23``) — mask values are
    written as raw 0/1 so demo outputs are directly comparable to the labels.
    """

    CLASSES = ('background', 'target')
    PALETTE = [[0, 0, 0], [1, 1, 1]]

    def __init__(self, img_suffix='.png', seg_map_suffix='.png', **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, **kwargs)

    def results2img(self, results, imgfile_prefix, indices=None):
        """Write predicted masks as uint8 PNGs
        (reference ``my_dataset.py:44``)."""
        from PIL import Image
        if indices is None:
            indices = list(range(len(self)))
        os.makedirs(imgfile_prefix, exist_ok=True)
        result_files = []
        for result, idx in zip(results, indices):
            filename = self.img_infos[idx]['filename']
            basename = osp.splitext(osp.basename(filename))[0]
            png_filename = osp.join(imgfile_prefix, f'{basename}.png')
            Image.fromarray(np.asarray(result).astype(np.uint8)).save(
                png_filename)
            result_files.append(png_filename)
        return result_files

    def format_results(self, results, imgfile_prefix, indices=None, **kwargs):
        if indices is None:
            indices = list(range(len(self)))
        assert isinstance(results, list), 'results must be a list.'
        assert isinstance(indices, list), 'indices must be a list.'
        return self.results2img(results, imgfile_prefix, indices)
