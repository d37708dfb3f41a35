"""Cityscapes dataset (≙ reference ``mmseg/datasets/cityscapes.py``)."""
from __future__ import annotations

import os.path as osp

import numpy as np

from stc_unet_tpu.core import get_classes, get_palette
from stc_unet_tpu.utils.logger import print_log
from .builder import DATASETS
from .custom import CustomDataset
from .dataset_wrappers import CityscapesLike


@DATASETS.register_module()
class CityscapesDataset(CustomDataset, CityscapesLike):
    """Cityscapes: ``_leftImg8bit.png`` images, ``_gtFine_labelTrainIds.png``
    maps; supports submission formatting (trainId → labelId png dump) and the
    official cityscapesscripts evaluation when that package is present."""

    CLASSES = tuple(get_classes('cityscapes'))
    PALETTE = get_palette('cityscapes')

    def __init__(self, img_suffix='_leftImg8bit.png',
                 seg_map_suffix='_gtFine_labelTrainIds.png', **kwargs):
        super().__init__(img_suffix=img_suffix,
                         seg_map_suffix=seg_map_suffix, **kwargs)

    @staticmethod
    def _convert_to_label_id(result):
        """trainId → id using cityscapesscripts tables."""
        if isinstance(result, str):
            result = np.load(result)
        import cityscapesscripts.helpers.labels as CSLabels
        result_copy = result.copy()
        for trainId, label in CSLabels.trainId2label.items():
            result_copy[result == trainId] = label.id
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
            try:
                import cityscapesscripts.helpers.labels as CSLabels
                palette = np.zeros((len(CSLabels.id2label), 3), dtype=np.uint8)
                for label_id, label in CSLabels.id2label.items():
                    palette[label_id] = label.color
                output.putpalette(palette)
            except ImportError:
                pass
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
