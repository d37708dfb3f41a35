"""AdaptivePadding (≙ reference ``models/utils/embed.py:12``): pad an NHWC
map so a (kernel, stride, dilation) sliding window covers it exactly.
'corner' pads bottom/right only; 'same' splits symmetrically."""
from __future__ import annotations

import math

import jax.numpy as jnp


class AdaptivePadding:
    def __init__(self, kernel_size=1, stride=1, dilation=1,
                 padding='corner'):
        assert padding in ('same', 'corner')
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.dilation = _pair(dilation)
        self.padding = padding

    def get_pad_shape(self, input_shape):
        h, w = input_shape
        kh, kw = self.kernel_size
        sh, sw = self.stride
        dh, dw = self.dilation
        oh = math.ceil(h / sh)
        ow = math.ceil(w / sw)
        pad_h = max((oh - 1) * sh + (kh - 1) * dh + 1 - h, 0)
        pad_w = max((ow - 1) * sw + (kw - 1) * dw + 1 - w, 0)
        return pad_h, pad_w

    def __call__(self, x):
        pad_h, pad_w = self.get_pad_shape(x.shape[1:3])
        if not pad_h and not pad_w:
            return x
        if self.padding == 'corner':
            pads = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
        else:
            pads = ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2), (0, 0))
        return jnp.pad(x, pads)


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)
