"""Neural building blocks (flax.linen, NHWC) — the mmcv-bricks equivalent.

The reference consumes ``ConvModule``, ``build_norm_layer``,
``build_activation_layer`` etc. from mmcv (external dep). Here they are
rebuilt TPU-first:

- NHWC layout everywhere (TPU conv-friendly; channels on the 128-lane axis).
- Explicit symmetric padding numbers to match torch Conv2d ``padding=k//2``
  exactly (XLA 'SAME' differs for even kernels / strides).
- BatchNorm is plain flax BatchNorm: under pjit with a data-sharded batch the
  moments are computed over the *global* batch, which IS SyncBN — the
  reference's ``SyncBatchNorm`` (e.g. ``unet_backbone.py:64``) needs no
  explicit collective here. Under shard_map/pmap, pass ``axis_name``.
- Submodule names mirror the torch attribute names (``conv``, ``bn``) so the
  torch→jax checkpoint converter is a mechanical key map.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def h_sigmoid(x):
    """ReLU6(x + 3) / 6 — reference ``unet_backbone.py:143``."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def h_swish(x):
    """x * h_sigmoid(x) — reference ``unet_backbone.py:152``."""
    return x * h_sigmoid(x)


_ACTIVATIONS: dict = {
    'ReLU': nn.relu,
    'ReLU6': lambda x: jnp.clip(x, 0.0, 6.0),
    'LeakyReLU': None,  # handled specially (negative_slope kwarg)
    'PReLU': None,      # parametric; use nn.PReLU module directly
    'SiLU': nn.silu,
    'Swish': nn.silu,
    'Sigmoid': nn.sigmoid,
    'Tanh': jnp.tanh,
    'GELU': nn.gelu,
    'HSwish': h_swish,
    'HSigmoid': h_sigmoid,
    'Identity': lambda x: x,
}


def build_activation_layer(act_cfg: Optional[dict]) -> Callable:
    """Return an activation *function* for an mmcv-style act_cfg dict."""
    if act_cfg is None:
        return lambda x: x
    cfg = dict(act_cfg)
    act_type = cfg.pop('type')
    if act_type == 'LeakyReLU':
        slope = cfg.get('negative_slope', 0.01)
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if act_type == 'GELU':
        return lambda x: nn.gelu(x, approximate=False)
    fn = _ACTIVATIONS.get(act_type)
    if fn is None:
        raise KeyError(f'Unsupported activation type: {act_type}')
    return fn


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

NORM_TYPES = ('BN', 'SyncBN', 'GN', 'LN', 'IN')


class BatchNorm(nn.Module):
    """BatchNorm2d with exact torch semantics (eps=1e-5, momentum=0.1).

    Differences from flax ``nn.BatchNorm`` that matter for checkpoint parity:
    torch updates ``running_var`` with the *unbiased* batch variance
    (divide by N-1) while normalizing with the biased one; momentum follows
    torch convention ``ra = (1-m)*ra + m*batch``.

    SyncBN: under pjit over a data-sharded global batch the moments are
    computed over the global batch automatically (XLA inserts the
    collectives), which IS the reference's SyncBatchNorm. ``axis_name`` is
    only needed under shard_map/pmap.
    """
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention
    axis_name: Optional[str] = None
    affine: bool = True  # torch BatchNorm2d(affine=False) → no scale/bias

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        if self.affine:
            scale = self.param('scale', nn.initializers.ones, (c,),
                               jnp.float32)
            bias = self.param('bias', nn.initializers.zeros, (c,),
                              jnp.float32)
        else:
            scale, bias = jnp.ones((c,), jnp.float32), jnp.zeros(
                (c,), jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


def build_norm_layer(norm_cfg: Optional[dict], num_features: Optional[int] = None):
    """Return (factory, needs_train_flag) for an mmcv-style norm_cfg.

    ``factory(name=...)`` instantiates a linen module; modules returned for
    BN/SyncBN take ``train`` in ``__call__``.
    """
    if norm_cfg is None:
        return None, False
    cfg = dict(norm_cfg)
    norm_type = cfg.pop('type')
    cfg.pop('requires_grad', None)
    if norm_type in ('BN', 'SyncBN', 'BN2d', 'BN1d'):
        eps = cfg.pop('eps', 1e-5)
        momentum = cfg.pop('momentum', 0.1)
        def factory(name='bn'):
            return BatchNorm(eps=eps, momentum=momentum, name=name)
        return factory, True
    if norm_type == 'GN':
        num_groups = cfg.pop('num_groups')
        eps = cfg.pop('eps', 1e-5)
        def factory(name='gn'):
            return nn.GroupNorm(num_groups=num_groups, epsilon=eps,
                                param_dtype=jnp.float32, name=name)
        return factory, False
    if norm_type == 'LN':
        eps = cfg.pop('eps', 1e-5)
        def factory(name='ln'):
            return nn.LayerNorm(epsilon=eps, param_dtype=jnp.float32, name=name)
        return factory, False
    if norm_type == 'IN':
        eps = cfg.pop('eps', 1e-5)
        def factory(name='in'):
            return nn.GroupNorm(num_groups=None, group_size=1, epsilon=eps,
                                use_bias=False, use_scale=False,
                                param_dtype=jnp.float32, name=name)
        return factory, False
    raise KeyError(f'Unsupported norm type: {norm_type}')


def _apply_norm(norm_module, x, train):
    if isinstance(norm_module, BatchNorm):
        return norm_module(x, train=train)
    return norm_module(x)


# ---------------------------------------------------------------------------
# conv
# ---------------------------------------------------------------------------


def _pair(v) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class Conv2d(nn.Module):
    """torch-semantics Conv2d on NHWC: explicit symmetric padding.

    Weight layout HWIO (flax default); the checkpoint converter transposes
    torch OIHW → HWIO.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Any] = None  # e.g. zeros (mmcv constant_init(0))

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        d = _pair(self.dilation)
        if isinstance(self.padding, str):
            pad = self.padding  # 'SAME'/'VALID' passthrough
        else:
            p = _pair(self.padding)
            pad = ((p[0], p[0]), (p[1], p[1]))
        extra = {}
        if self.kernel_init is not None:
            extra['kernel_init'] = self.kernel_init
        return nn.Conv(
            features=self.features, kernel_size=k, strides=s, padding=pad,
            kernel_dilation=d, feature_group_count=self.groups,
            use_bias=self.use_bias, dtype=x.dtype, param_dtype=jnp.float32,
            name='conv', **extra)(x)


class ConvTranspose2d(nn.Module):
    """torch-semantics ConvTranspose2d(k, stride) on NHWC.

    torch output size = (in-1)*stride - 2*pad + k + output_padding. flax
    ConvTranspose with padding='VALID' gives (in-1)*stride + k; we trim
    ``pad`` from the leading edge and ``pad - output_padding`` from the
    trailing edge (torch's output_padding adds rows/cols at bottom/right).
    Weight layout (kh, kw, in, out); note the torch→jax converter must FLIP
    the spatial dims (torch's op is the conv gradient, which flips; flax's
    does not).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        y = nn.ConvTranspose(
            features=self.features, kernel_size=k, strides=s, padding='VALID',
            use_bias=self.use_bias, dtype=x.dtype, param_dtype=jnp.float32,
            name='conv')(x)
        t = (p[0] - op[0], p[1] - op[1])
        assert t[0] >= 0 and t[1] >= 0, (
            'output_padding > padding not supported (would require trailing '
            f'zero-pad): padding={p}, output_padding={op}')
        if p[0] or p[1]:
            y = y[:, p[0]:y.shape[1] - t[0], p[1]:y.shape[2] - t[1], :]
        return y


class PReLU(nn.Module):
    """torch ``nn.PReLU(num_parameters=C)``: per-channel learned negative
    slope, init 0.25 (param name ``weight`` like torch)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param('weight', nn.initializers.constant(0.25),
                           (x.shape[-1],), jnp.float32)
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class ConvModule(nn.Module):
    """Conv + Norm + Act brick (mmcv ConvModule semantics).

    - ``bias='auto'``: bias iff no norm (mmcv rule).
    - ``order``: any permutation of ('conv', 'norm', 'act').
    - act_cfg ``type='PReLU'`` instantiates the parametric PReLU module
      (named ``activate``, ≙ mmcv's ``self.activate``).
    """
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    bias: Union[bool, str] = 'auto'
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    order: Tuple[str, ...] = ('conv', 'norm', 'act')
    in_channels: Optional[int] = None  # accepted for API compat; inferred

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = (self.norm_cfg is None) if self.bias == 'auto' else bool(self.bias)
        conv = Conv2d(self.out_channels, self.kernel_size, self.stride,
                      self.padding, self.dilation, self.groups,
                      use_bias=use_bias, name='conv_m')
        norm_factory, _ = build_norm_layer(self.norm_cfg)
        norm = norm_factory() if norm_factory is not None else None
        if self.act_cfg and dict(self.act_cfg).get('type') == 'PReLU':
            act = PReLU(name='activate')
        else:
            act = build_activation_layer(self.act_cfg) if self.act_cfg \
                else None
        for op in self.order:
            if op == 'conv':
                x = conv(x)
            elif op == 'norm' and norm is not None:
                x = _apply_norm(norm, x, train)
            elif op == 'act' and act is not None:
                x = act(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    """Depthwise conv + pointwise conv, each with norm/act (mmcv brick)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dw_norm_cfg: Union[dict, str, None] = 'default'
    dw_act_cfg: Union[dict, str, None] = 'default'
    pw_norm_cfg: Union[dict, str, None] = 'default'
    pw_act_cfg: Union[dict, str, None] = 'default'
    in_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_in = x.shape[-1]
        dw_norm = self.norm_cfg if self.dw_norm_cfg == 'default' else self.dw_norm_cfg
        dw_act = self.act_cfg if self.dw_act_cfg == 'default' else self.dw_act_cfg
        pw_norm = self.norm_cfg if self.pw_norm_cfg == 'default' else self.pw_norm_cfg
        pw_act = self.act_cfg if self.pw_act_cfg == 'default' else self.pw_act_cfg
        x = ConvModule(c_in, self.kernel_size, self.stride, self.padding,
                       self.dilation, groups=c_in, norm_cfg=dw_norm,
                       act_cfg=dw_act, name='depthwise_conv')(x, train=train)
        x = ConvModule(self.out_channels, 1, norm_cfg=pw_norm, act_cfg=pw_act,
                       name='pointwise_conv')(x, train=train)
        return x


# ---------------------------------------------------------------------------
# pooling / dropout
# ---------------------------------------------------------------------------


def max_pool2d(x, kernel_size=2, stride=None, padding=0, ceil_mode=False):
    """torch MaxPool2d semantics on NHWC (-inf padding; optional
    ceil_mode adds bottom/right -inf padding so the last partial window
    is kept, like torch)."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    eh = ew = 0
    if ceil_mode:
        eh = (-(x.shape[1] + 2 * p[0] - k[0])) % s[0]
        ew = (-(x.shape[2] + 2 * p[1] - k[1])) % s[1]
    pad = ((p[0], p[0] + eh), (p[1], p[1] + ew))
    return nn.max_pool(x, window_shape=k, strides=s, padding=pad)


def avg_pool2d(x, kernel_size=2, stride=None, padding=0,
               count_include_pad=True):
    """torch AvgPool2d semantics on NHWC."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    if count_include_pad or (p[0] == 0 and p[1] == 0):
        return nn.avg_pool(x, window_shape=k, strides=s,
                           padding=((p[0], p[0]), (p[1], p[1])))
    pad4 = ((0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k[0], k[1], 1), (1, s[0], s[1], 1), pad4)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k[0], k[1], 1), (1, s[0], s[1], 1), pad4)
    return summed / counts


def adaptive_avg_pool2d(x, output_size):
    """torch AdaptiveAvgPool2d on NHWC with exact torch bin boundaries.

    ``output_size`` entries may be None (keep that axis), matching the
    reference's strip pools ``AdaptiveAvgPool2d((None, 1))``
    (``unet_backbone.py:164-165``). Output sizes are static so the bin loop
    unrolls at trace time (no dynamic shapes).
    """
    oh, ow = output_size if isinstance(output_size, (tuple, list)) else (
        output_size, output_size)
    n, h, w, c = x.shape
    oh = h if oh is None else oh
    ow = w if ow is None else ow
    # accumulate in f32: bf16-native means lower to a ~10x-slower TPU
    # reduction than the fused convert+reduce, and lose precision
    in_dtype = x.dtype
    if x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)

    def pool_axis(arr, axis, in_size, out_size):
        if out_size == in_size:
            return arr
        if out_size == 1:
            return jnp.mean(arr, axis=axis, keepdims=True)
        if in_size % out_size == 0:
            # uniform bins → reshape-mean (fast path)
            step = in_size // out_size
            shape = list(arr.shape)
            shape[axis:axis + 1] = [out_size, step]
            return jnp.mean(arr.reshape(shape), axis=axis + 1)
        segs = []
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -(-((i + 1) * in_size) // out_size)  # ceil
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, start, end, axis=axis),
                axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    x = pool_axis(x, 1, h, oh)
    x = pool_axis(x, 2, w, ow)
    return x.astype(in_dtype)


def adaptive_max_pool2d(x, output_size):
    oh, ow = output_size if isinstance(output_size, (tuple, list)) else (
        output_size, output_size)
    n, h, w, c = x.shape
    oh = h if oh is None else oh
    ow = w if ow is None else ow
    if oh == 1 and ow == 1:
        return jnp.max(x, axis=(1, 2), keepdims=True)
    raise NotImplementedError('adaptive_max_pool2d only supports output 1x1')


class Dropout2d(nn.Module):
    """Spatial dropout: drops whole channels (torch Dropout2d semantics)."""
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dropout(rate=self.rate, deterministic=not train)(x)


class Linear(nn.Module):
    """torch-semantics Linear. Weight stored as (in, out) in flax; converter
    transposes torch (out, in)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=x.dtype, param_dtype=jnp.float32,
                        name='linear')(x)


def pad_hw(x, pad_lrtb):
    """F.pad semantics for NHWC: pad = (left, right, top, bottom)."""
    l, r, t, b = pad_lrtb
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
