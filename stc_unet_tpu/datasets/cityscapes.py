"""Cityscapes dataset (≙ reference ``mmseg/datasets/cityscapes.py``)."""
from __future__ import annotations

import os.path as osp

import numpy as np

from stc_unet_tpu.core import get_classes, get_palette
from stc_unet_tpu.utils.logger import print_log
from .builder import DATASETS
from .custom import CustomDataset
from .dataset_wrappers import CityscapesLike

# Public cityscapes label tables (trainId -> labelId, labelId -> color),
# mirroring cityscapesscripts.helpers.labels so the submission-formatting
# workflow works without that optional package installed. The official
# 'cityscapes' eval protocol still requires cityscapesscripts (reference
# cityscapes.py:211-215 raises ImportError the same way).
_CS_TRAINID2ID = {
    255: 0, -1: -1, 0: 7, 1: 8, 2: 11, 3: 12, 4: 13, 5: 17, 6: 19, 7: 20,
    8: 21, 9: 22, 10: 23, 11: 24, 12: 25, 13: 26, 14: 27, 15: 28, 16: 31,
    17: 32, 18: 33,
}
_CS_ID2COLOR = {
    0: (0, 0, 0), 1: (0, 0, 0), 2: (0, 0, 0), 3: (0, 0, 0), 4: (0, 0, 0),
    5: (111, 74, 0), 6: (81, 0, 81), 7: (128, 64, 128), 8: (244, 35, 232),
    9: (250, 170, 160), 10: (230, 150, 140), 11: (70, 70, 70),
    12: (102, 102, 156), 13: (190, 153, 153), 14: (180, 165, 180),
    15: (150, 100, 100), 16: (150, 120, 90), 17: (153, 153, 153),
    18: (153, 153, 153), 19: (250, 170, 30), 20: (220, 220, 0),
    21: (107, 142, 35), 22: (152, 251, 152), 23: (70, 130, 180),
    24: (220, 20, 60), 25: (255, 0, 0), 26: (0, 0, 142), 27: (0, 0, 70),
    28: (0, 60, 100), 29: (0, 0, 90), 30: (0, 0, 110), 31: (0, 80, 100),
    32: (0, 0, 230), 33: (119, 11, 32), -1: (0, 0, 142),
}


def _trainid2id_table():
    """trainId→labelId dict from cityscapesscripts when available, else the
    embedded public table."""
    try:
        import cityscapesscripts.helpers.labels as CSLabels
        return {tid: lbl.id for tid, lbl in CSLabels.trainId2label.items()}
    except ImportError:
        return dict(_CS_TRAINID2ID)


def _id2color_table():
    try:
        import cityscapesscripts.helpers.labels as CSLabels
        return {lid: lbl.color for lid, lbl in CSLabels.id2label.items()}
    except ImportError:
        return dict(_CS_ID2COLOR)


@DATASETS.register_module()
class CityscapesDataset(CustomDataset, CityscapesLike):
    """Cityscapes: ``_leftImg8bit.png`` images; supports submission
    formatting (trainId → labelId png dump) and the official
    cityscapesscripts evaluation when that package is present.

    Two fork quirks are replicated from the reference
    (``cityscapes.py:26-32``): PALETTE is the grayscale train-id ramp
    ``[[0,0,0], [1,1,1], ...]`` (upstream mmseg uses the official colors —
    those remain available via ``get_palette('cityscapes')``), and the
    default ``seg_map_suffix`` is ``'_gtFine_labelIds.png'`` (upstream uses
    ``'_gtFine_labelTrainIds.png'``)."""

    CLASSES = tuple(get_classes('cityscapes'))
    PALETTE = [[i, i, i] for i in range(19)]

    def __init__(self, img_suffix='_leftImg8bit.png',
                 seg_map_suffix='_gtFine_labelIds.png', **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, **kwargs)

    @staticmethod
    def _convert_to_label_id(result):
        """trainId → id (reference ``cityscapes.py:32-41``)."""
        if isinstance(result, str):
            result = np.load(result)
        result_copy = result.copy()
        for train_id, label_id in _trainid2id_table().items():
            mask = result == train_id
            # skip no-match ids: assigning -1 into an unsigned map would
            # overflow even under an all-False mask
            if mask.any():
                result_copy[mask] = label_id
        return result_copy

    def results2img(self, results, imgfile_prefix, to_label_id, indices=None):
        """Write result label maps as palette PNGs."""
        from PIL import Image
        import os
        if indices is None:
            indices = list(range(len(self)))
        os.makedirs(imgfile_prefix, exist_ok=True)
        result_files = []
        for result, idx in zip(results, indices):
            if to_label_id:
                result = self._convert_to_label_id(result)
            filename = self.img_infos[idx]['filename']
            basename = osp.splitext(osp.basename(filename))[0]
            png_filename = osp.join(imgfile_prefix, f'{basename}.png')
            output = Image.fromarray(result.astype(np.uint8)).convert('P')
            id2color = _id2color_table()
            palette = np.zeros((len(id2color), 3), dtype=np.uint8)
            for label_id, color in id2color.items():
                palette[label_id] = color
            output.putpalette(palette)
            output.save(png_filename)
            result_files.append(png_filename)
        return result_files

    def format_results(self, results, imgfile_prefix, to_label_id=True,
                       indices=None):
        if indices is None:
            indices = list(range(len(self)))
        assert isinstance(results, list), 'results must be a list.'
        assert isinstance(indices, list), 'indices must be a list.'
        return self.results2img(results, imgfile_prefix, to_label_id, indices)

    def evaluate(self, results, metric='mIoU', logger=None,
                 imgfile_prefix=None, **kwargs):
        """Standard metrics, plus the official 'cityscapes' protocol when
        requested (requires cityscapesscripts + label-id result dump)."""
        eval_results = dict()
        metrics = metric.copy() if isinstance(metric, list) else [metric]
        if 'cityscapes' in metrics:
            eval_results.update(
                self._evaluate_cityscapes(results, logger, imgfile_prefix))
            metrics.remove('cityscapes')
        if len(metrics) > 0:
            eval_results.update(
                super().evaluate(results, metrics, logger, **kwargs))
        return eval_results

    def _evaluate_cityscapes(self, results, logger, imgfile_prefix):
        try:
            import cityscapesscripts.evaluation.evalPixelLevelSemanticLabeling as CSEval  # noqa
        except ImportError:
            raise ImportError('Please run "pip install cityscapesscripts" to '
                              'install cityscapesscripts first.')
        msg = 'Evaluating in Cityscapes style'
        if logger is None:
            msg = '\n' + msg
        print_log(msg, logger=logger)
        result_dir = imgfile_prefix
        self.format_results(results, result_dir)
        eval_results = dict()
        print_log(f'Evaluating results under {result_dir} ...', logger=logger)
        CSEval.args.evalInstLevelScore = True
        CSEval.args.predictionPath = osp.abspath(result_dir)
        CSEval.args.evalPixelAccuracy = True
        CSEval.args.JSONOutput = False
        seg_map_list, pred_list = [], []
        import glob
        for seg_map in glob.glob(
                osp.join(self.ann_dir, '**/*gtFine_labelIds.png'),
                recursive=True):
            seg_map_list.append(seg_map)
            pred_list.append(CSEval.getPrediction(CSEval.args, seg_map))
        eval_results.update(
            CSEval.evaluateImgLists(pred_list, seg_map_list, CSEval.args))
        return eval_results
