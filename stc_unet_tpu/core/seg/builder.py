"""Pixel-sampler registry (≙ reference ``core/seg/builder.py``)."""
from stc_unet_tpu.utils import Registry

PIXEL_SAMPLERS = Registry('pixel sampler')


def build_pixel_sampler(cfg, **default_args):
    """Build pixel sampler for segmentation map."""
    return PIXEL_SAMPLERS.build(cfg, default_args=default_args)
