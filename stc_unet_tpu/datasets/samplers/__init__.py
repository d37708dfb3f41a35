"""Distributed index samplers (≙ reference ``mmseg/datasets/samplers``)."""
from .distributed_sampler import DistributedSampler

__all__ = ['DistributedSampler']
