"""DistributedSampler (≙ reference ``samplers/distributed_sampler.py:13``).

The reference subclasses ``torch.utils.data.DistributedSampler`` and fixes
its cross-rank shuffle determinism by seeding a fresh generator with
``epoch + seed`` (a ``sync_random_seed`` across the group). Here the same
contract is stated directly: every rank draws the *same* seed+epoch
permutation, the index list is padded to ``num_replicas * num_samples`` by
wrapping, and each rank takes its ``rank::num_replicas`` strided slice —
non-overlapping, equal-length shards on every process.

This class is the standalone per-rank index stream; ``datasets/builder.py``
uses the batch-aware :class:`~stc_unet_tpu.datasets.builder.EpochSampler`
internally (same permutation law, padded to batch multiples).

Absolute imports only: this module must be import-safe under both the
``stc_unet_tpu.*`` and ``mmseg.*`` package names.
"""
from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np


class DistributedSampler:

    def __init__(self, dataset, num_replicas: Optional[int] = None,
                 rank: Optional[int] = None, shuffle: bool = True,
                 seed: int = 0) -> None:
        from stc_unet_tpu.core.utils.dist_util import sync_random_seed
        from stc_unet_tpu.utils.util_distribution import get_dist_info
        if num_replicas is None or rank is None:
            drank, dworld = get_dist_info()
            num_replicas = dworld if num_replicas is None else num_replicas
            rank = drank if rank is None else rank
        if not 0 <= rank < num_replicas:
            raise ValueError(
                f'Invalid rank {rank}, rank should be in the interval '
                f'[0, {num_replicas - 1}]')
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.epoch = 0
        self.num_samples = int(math.ceil(len(dataset) / num_replicas))
        self.total_size = self.num_samples * num_replicas
        # identical across the group (reference seeds via sync_random_seed
        # so all ranks permute in the same order)
        self.seed = sync_random_seed(seed)

    def set_epoch(self, epoch: int) -> None:
        """Make each epoch use a different (but group-identical) order."""
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            rng = np.random.RandomState(self.epoch + self.seed)
            indices = rng.permutation(len(self.dataset)).tolist()
        else:
            indices = list(range(len(self.dataset)))
        # pad to evenly divisible by wrapping (reference
        # ``distributed_sampler.py:66``; unlike the reference's single-wrap
        # slice, repeat as needed so num_replicas > 2*len(dataset) — a tiny
        # debug split on a large mesh — shards instead of crashing)
        while len(indices) < self.total_size:
            indices += indices[:(self.total_size - len(indices))]
        assert len(indices) == self.total_size
        indices = indices[self.rank:self.total_size:self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices)

    def __len__(self) -> int:
        return self.num_samples
