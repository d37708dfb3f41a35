"""Base pixel sampler (≙ reference ``core/seg/sampler/base_pixel_sampler.py``)."""
from abc import ABCMeta, abstractmethod


class BasePixelSampler(metaclass=ABCMeta):
    """Base class of pixel samplers producing per-pixel loss weights."""

    def __init__(self, **kwargs):
        pass

    @abstractmethod
    def sample(self, seg_logit, seg_label):
        """Placeholder for sample function."""
