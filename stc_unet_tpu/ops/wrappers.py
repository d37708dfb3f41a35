"""Image resize ops with exact torch ``F.interpolate`` semantics.

TPU-native equivalent of reference ``mmseg/ops/wrappers.py:8`` (``resize``)
and ``:30`` (``Upsample``). Parity with torch bilinear/nearest sampling rules
(both ``align_corners`` modes) is load-bearing for checkpoint parity: the
decoder upsamples, logit-to-label resizes, and the rescale path all flow
through here (see reference ``decode_head.py:265``, ``encoder_decoder.py:77``).

Layout note: this framework is NHWC internally (TPU-friendly); ``resize``
operates on axes (1, 2) of a 4D array. Implementation is gather+lerp along
each axis — two vectorized gathers per axis, which XLA fuses well on TPU
(no scalar loops, static shapes).
"""
from __future__ import annotations

import functools
import warnings
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_coords(in_size: int, out_size: int, align_corners: bool,
                   scale: Optional[float] = None):
    """Source indices and lerp weights for 1-D linear resampling.

    Matches torch's coordinate transforms:
      align_corners=True:  src = i * (in-1)/(out-1)
      align_corners=False: src = (i + 0.5) / scale - 0.5, clamped, where
        scale is the LITERAL scale_factor when the caller passed one
        (torch recompute_scale_factor=None semantics) else out/in.
    Returns numpy arrays (static, baked into the jaxpr as constants).
    """
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        inv = (1.0 / scale) if scale else (in_size / out_size)
        src = (i + 0.5) * inv - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@functools.lru_cache(maxsize=256)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool,
                  scale: Optional[float] = None) -> np.ndarray:
    """(in, out) bicubic interpolation matrix, torch semantics (Keys kernel
    with a = -0.75, border-replicated taps). ≤4 nonzeros per column."""
    a = -0.75

    def w(t):
        t = np.abs(t)
        return np.where(
            t <= 1, ((a + 2) * t - (a + 3)) * t * t + 1,
            np.where(t < 2, (((t - 5) * t + 8) * t - 4) * a, 0.0))

    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        inv = (1.0 / scale) if scale else (in_size / out_size)
        src = (i + 0.5) * inv - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    m = np.zeros((in_size, out_size), np.float64)
    cols = np.arange(out_size)
    for k in range(-1, 3):
        idx = np.clip(i0 + k, 0, in_size - 1)
        np.add.at(m, (idx, cols), w(k - frac))
    return m.astype(np.float32)


def _resize_axis_cubic(x: jax.Array, axis: int, out_size: int,
                       align_corners: bool,
                       scale: Optional[float] = None) -> jax.Array:
    """1-D cubic resample along a spatial axis (same MXU-matmul form as
    :func:`_resize_axis_linear`)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    dtype = x.dtype
    m = _cubic_matrix(in_size, out_size, align_corners, scale)
    if dtype == jnp.bfloat16:
        operand, mat = x, jnp.asarray(m, jnp.bfloat16)
    else:
        operand = x.astype(jnp.float32) if dtype != jnp.float64 else x
        mat = jnp.asarray(m, operand.dtype)
    if axis == 1:
        out = jnp.einsum('nhwc,hk->nkwc', operand, mat)
    else:
        out = jnp.einsum('nhwc,wk->nhkc', operand, mat)
    return out.astype(dtype)


@functools.lru_cache(maxsize=256)
def _nearest_coords(in_size: int, out_size: int,
                    scale: Optional[float] = None):
    """torch 'nearest' (legacy): src_idx = floor(i / scale), scale the
    literal scale_factor when given else out/in."""
    i = np.arange(out_size, dtype=np.float64)
    inv = (1.0 / scale) if scale else (in_size / out_size)
    idx = np.floor(i * inv).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


@functools.lru_cache(maxsize=256)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool,
                   scale: Optional[float] = None) -> np.ndarray:
    """(in, out) interpolation matrix: ≤2 nonzeros per column (the lerp
    weights). Contracting with it IS the lerp — every other term is an
    exact 0.0, so f32 results match the elementwise form bit-for-bit."""
    i0, i1, w1 = _linear_coords(in_size, out_size, align_corners, scale)
    m = np.zeros((in_size, out_size), np.float32)
    cols = np.arange(out_size)
    np.add.at(m, (i0, cols), 1.0 - w1)
    np.add.at(m, (i1, cols), w1)
    return m


def _resize_axis_linear(x: jax.Array, axis: int, out_size: int,
                        align_corners: bool,
                        scale: Optional[float] = None) -> jax.Array:
    """1-D linear resample along a spatial axis of an NHWC array.

    Formulated as a matmul with the static interpolation matrix: on TPU a
    gather along a non-lane axis is HBM-catastrophic (measured 95.7 ms for
    (72,128,128,64) 2x vs 2.9 ms as an MXU einsum — 33x), while the matmul
    rides the MXU. bf16 inputs contract in bf16 with f32 accumulation
    (same contract as the conv layers); other dtypes contract in f32.
    """
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    dtype = x.dtype
    if in_size * out_size > 8_000_000:
        # giant axes (≳3k²): the dense interpolation matrix and its FLOPs
        # outgrow the gather cost — fall back to the two-tap lerp
        i0, i1, w1 = _linear_coords(in_size, out_size, align_corners, scale)
        xf = x.astype(jnp.float32) if dtype != jnp.float64 else x
        lo = jnp.take(xf, jnp.asarray(i0), axis=axis)
        hi = jnp.take(xf, jnp.asarray(i1), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        w = jnp.asarray(w1).reshape(shape)
        return (lo * (1.0 - w) + hi * w).astype(dtype)
    m = _linear_matrix(in_size, out_size, align_corners, scale)
    if dtype == jnp.bfloat16:
        operand, mat = x, jnp.asarray(m, jnp.bfloat16)
    else:
        operand = x.astype(jnp.float32) if dtype != jnp.float64 else x
        mat = jnp.asarray(m, operand.dtype)
    sub = 'nhwc,hH->nHwc' if axis == 1 else 'nhwc,wW->nhWc'
    out = jnp.einsum(sub, operand, mat,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype)


@functools.lru_cache(maxsize=256)
def _nearest_matrix(in_size: int, out_size: int,
                    scale: Optional[float] = None) -> np.ndarray:
    """(in, out) 0/1 selection matrix — nearest as a matmul (exact; see
    _resize_axis_linear for why gathers are avoided on TPU)."""
    idx = _nearest_coords(in_size, out_size, scale)
    m = np.zeros((in_size, out_size), np.float32)
    m[idx, np.arange(out_size)] = 1.0
    return m


def _resize_axis_nearest(x: jax.Array, axis: int, out_size: int,
                         scale: Optional[float] = None) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if not jnp.issubdtype(x.dtype, jnp.floating):
        idx = _nearest_coords(in_size, out_size, scale)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    m = jnp.asarray(_nearest_matrix(in_size, out_size, scale), x.dtype)
    sub = 'nhwc,hH->nHwc' if axis == 1 else 'nhwc,wW->nhWc'
    return jnp.einsum(sub, x, m,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def resize(input: jax.Array,
           size: Optional[Tuple[int, int]] = None,
           scale_factor: Optional[Union[float, Tuple[float, float]]] = None,
           mode: str = 'bilinear',
           align_corners: Optional[bool] = None,
           warning: bool = True) -> jax.Array:
    """Resize a NHWC (or NHW / HW-trailing-channel) image tensor.

    Drop-in semantic equivalent of reference ``mmseg/ops/wrappers.py:8``
    (which wraps ``F.interpolate`` on NCHW); here spatial axes are (1, 2)
    of a 4D NHWC array.

    Args:
        input: (N, H, W, C) array.
        size: target (H, W). Mutually exclusive with scale_factor.
        scale_factor: float or (sh, sw); output = floor(in * scale).
        mode: 'bilinear' | 'bicubic' | 'nearest'.
        align_corners: required semantics flag for bilinear (default False,
            as in torch); must be None for nearest.
        warning: emit the same alignment sanity warning as the reference.
    """
    if input.ndim != 4:
        raise ValueError(f'resize expects a 4D NHWC array, got {input.shape}')
    in_h, in_w = input.shape[1], input.shape[2]
    sh = sw = None
    if size is None:
        if scale_factor is None:
            raise ValueError('either size or scale_factor must be given')
        if isinstance(scale_factor, (tuple, list)):
            sh, sw = scale_factor
        else:
            sh = sw = scale_factor
        # torch recompute_scale_factor=None: the LITERAL scale enters the
        # source-coordinate math (differs from size-derived whenever
        # in*scale is fractional, e.g. 5 → 2 at 0.5)
        size = (int(in_h * sh), int(in_w * sw))
    out_h, out_w = int(size[0]), int(size[1])

    if (out_h, out_w) == (in_h, in_w):
        # identity resize (torch returns the input unchanged too; saves a
        # full gather pass in e.g. encode_decode's logit resize)
        return input

    if warning and align_corners and out_h > in_h:
        # same sanity warning as the reference (ops/wrappers.py:12-24)
        if ((out_h > 1 and out_w > 1 and in_h > 1 and in_w > 1)
                and (out_h - 1) % (in_h - 1) and (out_w - 1) % (in_w - 1)):
            warnings.warn(
                f'When align_corners={align_corners}, the output would be '
                'more aligned if input/output sizes satisfy '
                '(out-1) % (in-1) == 0', stacklevel=2)

    if mode == 'nearest':
        if align_corners is not None:
            raise ValueError('align_corners is not applicable for nearest')
        x = _resize_axis_nearest(input, 1, out_h, sh)
        x = _resize_axis_nearest(x, 2, out_w, sw)
        return x
    if mode == 'bilinear':
        ac = bool(align_corners)
        x = _resize_axis_linear(input, 1, out_h, ac, sh)
        x = _resize_axis_linear(x, 2, out_w, ac, sw)
        return x
    if mode == 'bicubic':
        ac = bool(align_corners)
        x = _resize_axis_cubic(input, 1, out_h, ac, sh)
        x = _resize_axis_cubic(x, 2, out_w, ac, sw)
        return x
    raise ValueError(f'Unsupported resize mode: {mode}')


class Upsample:
    """Callable module-style wrapper over :func:`resize`
    (≙ reference ``ops/wrappers.py:30`` ``Upsample(nn.Module)``)."""

    def __init__(self, size=None, scale_factor=None, mode='nearest',
                 align_corners=None):
        self.size = size
        self.scale_factor = scale_factor
        self.mode = mode
        self.align_corners = align_corners

    def __call__(self, x):
        if not self.size:
            size = [int(t * self.scale_factor) for t in x.shape[1:3]]
        else:
            size = self.size
        return resize(x, size=tuple(size), mode=self.mode,
                      align_corners=self.align_corners, warning=False)
