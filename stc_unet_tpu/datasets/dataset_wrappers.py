"""Dataset wrappers (≙ reference ``datasets/dataset_wrappers.py:17,166,196``)."""
from __future__ import annotations

import bisect
import collections
import copy
from itertools import chain

import numpy as np

from .builder import DATASETS, PIPELINES
from .custom import CustomDataset


@DATASETS.register_module()
class ConcatDataset:
    """Concatenation of datasets with aggregated or separate evaluation
    (reference ``dataset_wrappers.py:17``)."""

    def __init__(self, datasets, separate_eval=True):
        assert len(datasets) > 0
        self.datasets = datasets
        self.separate_eval = separate_eval
        assert separate_eval in [True, False], \
            f'separate_eval can only be True or False, but get {separate_eval}'
        self.CLASSES = datasets[0].CLASSES
        self.PALETTE = datasets[0].PALETTE
        # reference dataset_wrappers.py:37-40: concatenated Cityscapes is
        # unsupported regardless of separate_eval
        if any(isinstance(ds, CityscapesLike) for ds in datasets):
            raise NotImplementedError(
                'Evaluating ConcatDataset containing CityscapesDataset'
                'is not supported!')
        self.cumulative_sizes = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self.cumulative_sizes[-1])

    def _locate(self, idx):
        if idx < 0:
            if -idx > len(self):
                raise ValueError(
                    'absolute value of index should not exceed dataset '
                    'length')
            idx = len(self) + idx
        dataset_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        sample_idx = idx if dataset_idx == 0 else \
            idx - self.cumulative_sizes[dataset_idx - 1]
        return dataset_idx, int(sample_idx)

    def __getitem__(self, idx):
        dataset_idx, sample_idx = self._locate(idx)
        return self.datasets[dataset_idx][sample_idx]

    def evaluate(self, results, logger=None, **kwargs):
        """Per-dataset evaluation with prefixed keys, or aggregated
        evaluation when ``separate_eval=False``."""
        assert len(results) == len(self)
        if self.separate_eval:
            dataset_idx = -1
            total_eval_results = {}
            for size, dataset in zip(self.cumulative_sizes, self.datasets):
                start_idx = 0 if dataset_idx == -1 else \
                    self.cumulative_sizes[dataset_idx]
                end_idx = int(size)
                results_per_dataset = results[start_idx:end_idx]
                eval_results_per_dataset = dataset.evaluate(
                    results_per_dataset, logger=logger, **kwargs)
                dataset_idx += 1
                for k, v in eval_results_per_dataset.items():
                    total_eval_results.update({f'{dataset_idx}_{k}': v})
            return total_eval_results
        # aggregated: pre_eval tuples can be reduced directly; raw results
        # need the concatenated gt stream
        if len(set([type(ds) for ds in self.datasets])) != 1:
            raise NotImplementedError(
                'All the datasets should have same types when '
                'self.separate_eval=False')
        if np.all([isinstance(r, tuple) and len(r) == 4 for r in results]):
            return self.datasets[0].evaluate(results, logger=logger, **kwargs)
        gt_seg_maps = chain(
            *[dataset.get_gt_seg_maps() for dataset in self.datasets])
        return self.datasets[0].evaluate(
            results, gt_seg_maps=gt_seg_maps, logger=logger, **kwargs)

    def get_dataset_idx_and_sample_idx(self, indice):
        return self._locate(indice)

    def pre_eval(self, preds, indices):
        if not isinstance(indices, list):
            indices = [indices]
        if not isinstance(preds, list):
            preds = [preds]
        ret = []
        for pred, indice in zip(preds, indices):
            dataset_idx, sample_idx = self._locate(indice)
            ret.extend(self.datasets[dataset_idx].pre_eval(pred, sample_idx))
        return ret

    def format_results(self, results, imgfile_prefix, indices=None, **kwargs):
        if indices is None:
            indices = list(range(len(self)))
        ret = []
        for result, indice in zip(results, indices):
            dataset_idx, sample_idx = self._locate(indice)
            ret.extend(self.datasets[dataset_idx].format_results(
                [result], f'{imgfile_prefix}/{dataset_idx}',
                indices=[sample_idx], **kwargs))
        return ret


class CityscapesLike:
    """Marker mixin for datasets whose aggregated eval is unsupported."""


@DATASETS.register_module()
class RepeatDataset:
    """Repeat a dataset N times (reference ``dataset_wrappers.py:166``)."""

    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        self.CLASSES = dataset.CLASSES
        self.PALETTE = dataset.PALETTE
        self._ori_len = len(dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def __len__(self):
        return self.times * self._ori_len


@DATASETS.register_module()
class MultiImageMixDataset:
    """Multi-image-mix wrapper for mosaic-style transforms
    (reference ``dataset_wrappers.py:196``)."""

    def __init__(self, dataset, pipeline, skip_type_keys=None):
        assert isinstance(pipeline, collections.abc.Sequence)
        if skip_type_keys is not None:
            assert all(isinstance(k, str) for k in skip_type_keys)
        self._skip_type_keys = skip_type_keys
        self.pipeline = []
        self.pipeline_types = []
        for transform in pipeline:
            if isinstance(transform, dict):
                self.pipeline_types.append(transform['type'])
                self.pipeline.append(PIPELINES.build(transform))
            else:
                raise TypeError('pipeline must be a dict')
        self.dataset = dataset
        self.CLASSES = dataset.CLASSES
        self.PALETTE = dataset.PALETTE
        self.num_samples = len(dataset)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        results = copy.deepcopy(self.dataset[idx])
        for transform, transform_type in zip(self.pipeline,
                                             self.pipeline_types):
            if self._skip_type_keys is not None and \
                    transform_type in self._skip_type_keys:
                continue
            if hasattr(transform, 'get_indexes'):
                indexes = transform.get_indexes(self.dataset)
                if not isinstance(indexes, collections.abc.Sequence):
                    indexes = [indexes]
                mix_results = [
                    copy.deepcopy(self.dataset[index]) for index in indexes]
                results['mix_results'] = mix_results
            results = transform(results)
            if 'mix_results' in results:
                results.pop('mix_results')
        return results

    def update_skip_type_keys(self, skip_type_keys):
        assert all(isinstance(k, str) for k in skip_type_keys)
        self._skip_type_keys = skip_type_keys
