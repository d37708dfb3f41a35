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
    'window_partition', 'window_reverse', 'check_pretrained_init_cfg',
    'nchw_to_nlc', 'nlc_to_nchw', 'nchw2nlc2nchw', 'nlc2nchw2nlc'
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


def nchw2nlc2nchw(module, x, contiguous=False, **kwargs):
    """Run a token-sequence ``module`` over a feature map (NHWC-native ≙ of
    reference ``models/utils/shape_convert.py:32``): flatten (N, H, W, C) →
    (N, L, C), apply ``module`` (extra kwargs pass through), reshape back.

    ``contiguous`` is accepted for API parity; XLA owns physical layout, so
    it is a no-op here (the reference inserts ``.contiguous()`` calls).
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h * w, c)
    x = module(x, **kwargs)
    return x.reshape(n, h, w, -1)


def nlc2nchw2nlc(module, x, hw_shape, contiguous=False, **kwargs):
    """Run a feature-map ``module`` over a token sequence (NHWC-native ≙ of
    reference ``models/utils/shape_convert.py:74``): reshape (N, L, C) →
    (N, H, W, C), apply ``module``, flatten back. ``contiguous`` is a no-op
    (see :func:`nchw2nlc2nchw`)."""
    h, w = hw_shape
    n, l, c = x.shape
    assert l == h * w, "The seq_len doesn't match H, W"
    x = x.reshape(n, h, w, c)
    x = module(x, **kwargs)
    return x.reshape(n, h * w, -1)


def check_pretrained_init_cfg(pretrained, init_cfg):
    """The mmcv BaseModule constructor contract shared by the transformer
    backbones (reference e.g. ``twins.py`` ctor, tested in
    ``tests/test_backbones/test_twins.py:83-92``): ``pretrained`` must be
    a str path or None, and must not be combined with an ``init_cfg``.
    Call from a backbone's ``__post_init__``.
    """
    if pretrained is not None:
        # "not both" is checked BEFORE the type check (mmcv BaseModule
        # order — reference test_twins.py:96-103 expects AssertionError for
        # pretrained=123 + init_cfg=<anything>, TypeError only when
        # init_cfg is None)
        assert init_cfg is None, \
            'init_cfg and pretrained cannot be specified at the same time'
        if not isinstance(pretrained, str):
            raise TypeError('pretrained must be a str path or None, '
                            f'got {type(pretrained).__name__}')
    from collections.abc import Mapping
    if init_cfg is not None and \
            not isinstance(init_cfg, (Mapping, list, tuple)):
        # the reference rejects a non-dict init_cfg with TypeError inside
        # mmcv BaseModule.init_weights (e.g. test_twins.py:69-71); raising
        # at construction is this framework's earliest equivalent point.
        # Mapping, not dict: flax's clone-on-init wraps dict attributes in
        # FrozenDict.
        raise TypeError('init_cfg must be a dict, a list of dicts or None, '
                        f'got {type(init_cfg).__name__}')


def check_img_size_out_indices(img_size, out_indices):
    """ViT-family constructor contract (reference ``vit.py:141-160``,
    shared verbatim by BEiT/MAE per ``test_beit.py:15-25`` /
    ``test_mae.py:15-25``): img_size int or ≤2-tuple, out_indices
    int/list/tuple."""
    if isinstance(img_size, (tuple, list)):
        assert len(img_size) <= 2, \
            f'img_size tuple length must be <= 2, got {img_size}'
    elif not isinstance(img_size, int):
        raise TypeError('img_size must be an int or a tuple, '
                        f'got {type(img_size).__name__}')
    if not isinstance(out_indices, (int, list, tuple)):
        raise TypeError('out_indices must be an int, list or tuple, '
                        f'got {type(out_indices).__name__}')
