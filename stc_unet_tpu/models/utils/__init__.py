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
    'window_partition', 'window_reverse'
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
