"""DistributedSampler contract (≙ reference
``mmseg/datasets/samplers/distributed_sampler.py`` semantics: group-identical
seeded shuffle, wrap-padding to even shards, strided non-overlapping
subsampling)."""
import numpy as np
import pytest

from stc_unet_tpu.datasets import DistributedSampler
from stc_unet_tpu.datasets.samplers import DistributedSampler as DS2


def test_sampler_exported_from_subpackage():
    assert DistributedSampler is DS2


def test_shards_partition_the_dataset():
    data = list(range(12))
    shards = [list(DistributedSampler(data, num_replicas=3, rank=r, seed=1))
              for r in range(3)]
    assert all(len(s) == 4 for s in shards)
    flat = sorted(i for s in shards for i in s)
    assert flat == sorted(range(12))  # disjoint cover when divisible


def test_wrap_padding_when_not_divisible():
    data = list(range(10))
    shards = [list(DistributedSampler(data, num_replicas=4, rank=r, seed=0))
              for r in range(4)]
    # ceil(10/4)=3 per rank, total 12: every index appears, 2 repeat
    assert all(len(s) == 3 for s in shards)
    flat = [i for s in shards for i in s]
    assert set(flat) == set(range(10))
    assert len(flat) == 12


def test_epoch_determinism_and_reshuffle():
    data = list(range(32))
    s = DistributedSampler(data, num_replicas=2, rank=0, seed=7)
    e0 = list(s)
    assert list(s) == e0  # same epoch → same order
    s.set_epoch(1)
    e1 = list(s)
    assert e1 != e0  # new epoch → new permutation
    # all ranks permute identically: rank 1 at epoch 1 is disjoint from e1
    s1 = DistributedSampler(data, num_replicas=2, rank=1, seed=7)
    s1.set_epoch(1)
    assert set(e1).isdisjoint(set(s1))


def test_no_shuffle_is_strided_arange():
    data = list(range(8))
    s = DistributedSampler(data, num_replicas=2, rank=1, shuffle=False)
    assert list(s) == [1, 3, 5, 7]


def test_tiny_dataset_many_replicas():
    """num_replicas > 2*len(dataset) must shard by repetition, not crash
    (the reference's single-wrap pad slice would assert here)."""
    data = list(range(3))
    shards = [list(DistributedSampler(data, num_replicas=8, rank=r, seed=0))
              for r in range(8)]
    assert all(len(s) == 1 for s in shards)
    assert set(i for s in shards for i in s) == {0, 1, 2}


def test_rank_validation():
    with pytest.raises(ValueError):
        DistributedSampler(list(range(4)), num_replicas=2, rank=2)


def test_defaults_from_process_env():
    # single-process: rank 0 of 1
    s = DistributedSampler(list(range(5)), seed=0, shuffle=False)
    assert s.num_replicas == 1 and s.rank == 0
    assert list(s) == [0, 1, 2, 3, 4]
    assert len(s) == 5


def test_matches_builder_epoch_sampler_law():
    """The standalone sampler and the builder's batch-aware EpochSampler
    draw the same seed+epoch permutation family."""
    from stc_unet_tpu.datasets import EpochSampler
    n, seed = 16, 3
    es = EpochSampler(n, shuffle=True, seed=seed, num_replicas=1, rank=0,
                      batch_size=1)
    es.set_epoch(2)
    ds = DistributedSampler(list(range(n)), num_replicas=1, rank=0, seed=0)
    ds.set_epoch(seed + 2)  # EpochSampler permutes with seed+epoch
    assert list(ds) == list(np.asarray(es.indices()))
