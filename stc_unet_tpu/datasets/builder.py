"""Dataset/pipeline registries, build functions and the TPU-native dataloader
(≙ reference ``mmseg/datasets/builder.py``).

The reference's loader stack is torch DataLoader + DistributedSampler +
DataContainer collate (``builder.py:90-181``). TPU-native replacement:

- numpy batch collation (NHWC stacks) — batches feed ``jax.device_put`` with
  a sharding, no pinned-memory scatter needed;
- a thread-pool loader (cv2/numpy release the GIL; processes are unnecessary);
- epoch-deterministic shuffling with DistributedSampler semantics
  (pad-to-divisible, rank-strided subsample — reference
  ``samplers/distributed_sampler.py:54-72``) so multi-host runs read disjoint
  shards of an identical permutation.
"""
from __future__ import annotations

import copy
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from stc_unet_tpu.utils import Registry

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')


def _concat_dataset(cfg, default_args=None):
    """Expand list-valued img_dir/ann_dir/split into a ConcatDataset
    (reference ``builder.py:29``)."""
    from .dataset_wrappers import ConcatDataset
    img_dir = cfg['img_dir']
    ann_dir = cfg.get('ann_dir', None)
    split = cfg.get('split', None)
    num_img_dir = len(img_dir) if isinstance(img_dir, (list, tuple)) else 1
    if ann_dir is not None:
        num_ann_dir = len(ann_dir) if isinstance(ann_dir, (list, tuple)) else 1
    else:
        num_ann_dir = 0
    if split is not None:
        num_split = len(split) if isinstance(split, (list, tuple)) else 1
    else:
        num_split = 0
    # exact reference count contract (``builder.py:46-50``, pinned by
    # tests/test_data/test_dataset_builder.py:106-135)
    if num_img_dir > 1:
        assert num_img_dir == num_ann_dir or num_ann_dir == 0, \
            'len(ann_dir) should be zero or len(img_dir) when ' \
            'len(img_dir) > 1'
        assert num_img_dir == num_split or num_split == 0, \
            'len(split) should be zero or len(img_dir) when ' \
            'len(img_dir) > 1'
    else:
        assert num_split == num_ann_dir or num_ann_dir <= 1, \
            'len(split) should equal len(ann_dir) when len(img_dir) == 1 ' \
            'and len(ann_dir) > 1'
    num_dset = max(num_split, num_img_dir)

    separate_eval = cfg.get('separate_eval', True)
    datasets = []
    for i in range(num_dset):
        data_cfg = copy.deepcopy(cfg)
        data_cfg.pop('separate_eval', None)
        if isinstance(img_dir, (list, tuple)):
            data_cfg['img_dir'] = img_dir[i]
        if isinstance(ann_dir, (list, tuple)):
            data_cfg['ann_dir'] = ann_dir[i]
        if isinstance(split, (list, tuple)):
            data_cfg['split'] = split[i]
        datasets.append(build_dataset(data_cfg, default_args))
    return ConcatDataset(datasets, separate_eval)


def build_dataset(cfg, default_args=None):
    """Build a dataset from cfg (reference ``builder.py:67``)."""
    from .dataset_wrappers import (ConcatDataset, MultiImageMixDataset,
                                   RepeatDataset)
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    if cfg['type'] == 'RepeatDataset':
        return RepeatDataset(
            build_dataset(cfg['dataset'], default_args), cfg['times'])
    if cfg['type'] == 'ConcatDataset':
        return ConcatDataset(
            [build_dataset(c, default_args) for c in cfg['datasets']],
            cfg.get('separate_eval', True))
    if cfg['type'] == 'MultiImageMixDataset':
        cp_cfg = copy.deepcopy(cfg)
        cp_cfg['dataset'] = build_dataset(cp_cfg['dataset'])
        cp_cfg.pop('type')
        return MultiImageMixDataset(**cp_cfg)
    if isinstance(cfg.get('img_dir'), (list, tuple)) or isinstance(
            cfg.get('split', None), (list, tuple)):
        return _concat_dataset(cfg, default_args)
    return DATASETS.build(cfg, default_args=default_args)


def inject_img_cache(dataset_cfg, mode, cache_dir=None):
    """Propagate ``data.img_cache=<'ram'|'disk'>`` into a dataset cfg.

    Convenience for the cfg flag honored by ``tools/train.py`` /
    ``tools/test.py``: recursively walks wrapper-dataset cfgs
    (Repeat/Concat/MultiImageMix nesting, list cfgs) and sets
    ``cache``/``cache_dir`` on every ``LoadImageFromFile`` /
    ``LoadAnnotations`` pipeline entry that does not already configure a
    cache explicitly (per-transform settings win). Mutates and returns
    ``dataset_cfg``. See ``pipelines/img_cache.py`` for semantics.
    """
    if isinstance(dataset_cfg, (list, tuple)):
        for c in dataset_cfg:
            inject_img_cache(c, mode, cache_dir)
        return dataset_cfg
    if not isinstance(dataset_cfg, dict):
        return dataset_cfg
    for key in ('dataset', 'datasets'):
        if key in dataset_cfg:
            inject_img_cache(dataset_cfg[key], mode, cache_dir)

    def _walk(steps):
        for step in steps:
            if not isinstance(step, dict):
                continue
            if (step.get('type') in ('LoadImageFromFile',
                                     'LoadAnnotations')
                    and 'cache' not in step):
                step['cache'] = mode
                if cache_dir is not None:
                    step['cache_dir'] = cache_dir
            # wrapper transforms (MultiScaleFlipAug etc.) nest a list
            if isinstance(step.get('transforms'), (list, tuple)):
                _walk(step['transforms'])

    _walk(dataset_cfg.get('pipeline', []))
    return dataset_cfg


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of pipeline outputs into a model batch.

    Array values with a common shape are stacked on a new leading axis;
    ``img_metas`` (and any non-array or TTA-list value) becomes a list.
    TTA samples (dict-of-lists from MultiScaleFlipAug) collate into
    ``imgs[aug] -> (N, ...)`` lists, mirroring the reference's aug-major
    nesting.
    """
    assert len(samples) > 0
    elem = samples[0]
    batch: Dict[str, Any] = {}
    for key in elem:
        values = [s[key] for s in samples]
        if isinstance(elem[key], list):
            # TTA: aug-major — one stacked batch per aug variant
            num_augs = len(elem[key])
            if num_augs and isinstance(elem[key][0], np.ndarray):
                batch[key] = [
                    np.stack([v[a] for v in values]) for a in range(num_augs)]
            else:
                batch[key] = [[v[a] for v in values] for a in range(num_augs)]
        elif isinstance(elem[key], np.ndarray):
            batch[key] = np.stack(values)
        else:
            batch[key] = values
    return batch


class EpochSampler:
    """DistributedSampler-equivalent index stream
    (reference ``samplers/distributed_sampler.py:13``).

    All ranks draw the same seed+epoch permutation, pad it to a multiple of
    world_size * samples_per_gpu, and take a rank-strided slice.
    """

    def __init__(self, n: int, shuffle: bool, seed: int, num_replicas: int,
                 rank: int, batch_size: int, drop_last: bool = False):
        self.n = n
        self.shuffle = shuffle
        self.seed = seed or 0
        self.num_replicas = num_replicas
        self.rank = rank
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        step = self.num_replicas * self.batch_size
        if self.drop_last:
            total = (len(order) // step) * step
            order = order[:total]
        else:
            total = int(np.ceil(len(order) / step)) * step
            if total > len(order) and len(order) > 0:
                pad = np.resize(order, total - len(order))
                order = np.concatenate([order, pad])
        return order[self.rank::self.num_replicas]

    def __len__(self):
        per_rank = len(self.indices())
        return per_rank // self.batch_size


class DataLoader:
    """Thread-pool batch loader over a map-style dataset.

    Yields collated numpy batches; epoch-aware (call ``set_epoch`` or iterate
    via the runner which does). ``num_workers=0`` loads inline.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: Optional[int] = None,
                 num_replicas: int = 1, rank: int = 0,
                 drop_last: bool = False, persistent_workers: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.sampler = EpochSampler(len(dataset), shuffle, seed or 0,
                                    num_replicas, rank, batch_size, drop_last)
        self._pool = (ThreadPoolExecutor(max_workers=num_workers)
                      if num_workers > 0 else None)

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        return max(len(self.sampler), 0)

    def _load(self, idx: int):
        return self.dataset[int(idx)]

    def __iter__(self):
        indices = self.sampler.indices()
        nb = len(indices) // self.batch_size
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        if self._pool is None:
            for b in batches:
                yield collate([self._load(i) for i in b])
            return
        # pipelined: prefetch next batch while the current one is consumed
        pending = []
        ahead = 2
        it = iter(batches)
        try:
            for _ in range(ahead):
                b = next(it, None)
                if b is not None:
                    pending.append([self._pool.submit(self._load, i)
                                    for i in b])
            while pending:
                futures = pending.pop(0)
                b = next(it, None)
                if b is not None:
                    pending.append([self._pool.submit(self._load, i)
                                    for i in b])
                yield collate([f.result() for f in futures])
        finally:
            pass


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int,
                     num_gpus: int = 1, dist: bool = True, shuffle: bool = True,
                     seed: Optional[int] = None, drop_last: bool = False,
                     pin_memory: bool = True, persistent_workers: bool = True,
                     num_replicas: Optional[int] = None, rank: int = 0,
                     **kwargs):
    """Build the loader (reference ``builder.py:90``).

    In the TPU design one *process* feeds all local devices, so the returned
    batches carry the full per-host batch: ``samples_per_gpu *
    local_device_count`` when ``dist`` (the pjit data axis shards it).
    ``num_replicas``/``rank`` stride across hosts (multi-host data loading).
    """
    if num_replicas is None:
        num_replicas = 1
    batch_size = samples_per_gpu * max(num_gpus, 1)
    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle,
                      num_workers=workers_per_gpu, seed=seed,
                      num_replicas=num_replicas, rank=rank,
                      drop_last=drop_last)


def worker_init_fn(worker_id: int, num_workers: int, rank: int, seed: int):
    """Per-worker seeding (reference ``builder.py:181``); kept for API
    parity — thread workers share the process RNG, seeded by the runner."""
    worker_seed = num_workers * rank + worker_id + seed
    np.random.seed(worker_seed)
    random.seed(worker_seed)
