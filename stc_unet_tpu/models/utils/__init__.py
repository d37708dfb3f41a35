from ..backbones.resnet import ResLayer
from ..backbones.unet import UpConvBlock
from .embed_pad import AdaptivePadding
from .inverted_residual import (InvertedResidual, InvertedResidualV3,
                                SELayer, make_divisible)
from .self_attention_block import SelfAttentionBlock
from .swin_core import (DropPath, PatchEmbed, PatchMerging,
                        SwinTransformerBlock, WindowAttention, drop_path,
                        window_partition, window_reverse)

__all__ = [
    'AdaptivePadding', 'ResLayer', 'UpConvBlock',
    'InvertedResidual', 'InvertedResidualV3', 'SELayer', 'make_divisible',
    'SelfAttentionBlock', 'DropPath', 'PatchEmbed', 'PatchMerging',
    'SwinTransformerBlock', 'WindowAttention', 'drop_path',
    'window_partition', 'window_reverse', 'check_pretrained_init_cfg'
]


def nchw_to_nlc(x):
    """(N, H, W, C) map → (N, L, C) tokens (NHWC-native equivalent of
    reference ``models/utils/shape_convert.py``)."""
    n, h, w, c = x.shape
    return x.reshape(n, h * w, c)


def nlc_to_nchw(x, hw_shape):
    h, w = hw_shape
    n, l, c = x.shape
    assert l == h * w
    return x.reshape(n, h, w, c)


def check_pretrained_init_cfg(pretrained, init_cfg):
    """The mmcv BaseModule constructor contract shared by the transformer
    backbones (reference e.g. ``twins.py`` ctor, tested in
    ``tests/test_backbones/test_twins.py:83-92``): ``pretrained`` must be
    a str path or None, and must not be combined with an ``init_cfg``.
    Call from a backbone's ``__post_init__``.
    """
    if pretrained is not None:
        if not isinstance(pretrained, str):
            raise TypeError('pretrained must be a str path or None, '
                            f'got {type(pretrained).__name__}')
        assert init_cfg is None, \
            'init_cfg and pretrained cannot be specified at the same time'
