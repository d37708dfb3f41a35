"""Torch-oracle forward goldens, backbone batch 2: HRNet (reference
``backbones/hrnet.py``) — stem, Bottleneck stage 1, transitions, multi-branch
HRModules with BILINEAR (align_corners=False) fuse upsampling.

Same protocol as batch 1: randomize the flax module's weights, re-run the
reference math in plain torch on the same weights, require rtol 1e-4.
This batch caught the nearest-vs-bilinear fuse-upsample bug.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_for_bb2',
    _osp.join(_osp.dirname(_osp.dirname(_osp.abspath(__file__))),
              'test_heads', 'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

t, bn, _randomize, _flat = _b1.t, _b1.bn, _b1._randomize, _b1._flat


def _conv(x, fv, name, stride=1, padding=0, dilation=1, groups=1):
    w = t(fv[f'params/{name}/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv/bias')
    return F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                    padding=padding, dilation=dilation, groups=groups)


def _cm(x, fv, name, stride=1, padding=0, act=True):
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                 padding=padding)
    x = bn(x, fv, f'{name}/bn')
    return F.relu(x) if act else x


def _basic_block(x, fv, p, downsample):
    out = F.relu(bn(_conv(x, fv, f'{p}/conv1', padding=1), fv, f'{p}/bn1'))
    out = bn(_conv(out, fv, f'{p}/conv2', padding=1), fv, f'{p}/bn2')
    idn = x
    if downsample:
        idn = bn(_conv(x, fv, f'{p}/downsample/0'), fv, f'{p}/downsample/1')
    return F.relu(out + idn)


def _bottleneck(x, fv, p, downsample):
    out = F.relu(bn(_conv(x, fv, f'{p}/conv1'), fv, f'{p}/bn1'))
    out = F.relu(bn(_conv(out, fv, f'{p}/conv2', padding=1), fv, f'{p}/bn2'))
    out = bn(_conv(out, fv, f'{p}/conv3'), fv, f'{p}/bn3')
    idn = x
    if downsample:
        idn = bn(_conv(x, fv, f'{p}/downsample/0'), fv, f'{p}/downsample/1')
    return F.relu(out + idn)


def _up(z, factor):
    return F.interpolate(z, scale_factor=factor, mode='bilinear',
                         align_corners=False)


EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(1,), num_channels=(4,)),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(2, 2), num_channels=(4, 8)),
    stage3=dict(num_modules=2, num_branches=3, block='BASIC',
                num_blocks=(2, 2, 2), num_channels=(4, 8, 16)),
    stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)),
)


def _hr_module(xs, fv, p, num_branches, num_blocks, num_channels,
               in_channels, multiscale=True):
    outs = []
    for i in range(num_branches):
        x = xs[i]
        for j in range(num_blocks[i]):
            ds = j == 0 and x.shape[1] != num_channels[i]
            x = _basic_block(x, fv, f'{p}/branches_{i}_{j}', ds)
        outs.append(x)
    if num_branches == 1:
        return outs
    fused = []
    for i in range(num_branches if multiscale else 1):
        y = None
        for j in range(num_branches):
            z = outs[j]
            if j > i:
                z = bn(_conv(z, fv, f'{p}/fuse_{i}_{j}_conv'),
                       fv, f'{p}/fuse_{i}_{j}_bn')
                z = _up(z, 2 ** (j - i))
            elif j < i:
                for k in range(i - j):
                    z = bn(_conv(z, fv, f'{p}/fuse_{i}_{j}_down{k}_conv',
                                 stride=2, padding=1),
                           fv, f'{p}/fuse_{i}_{j}_down{k}_bn')
                    if k != i - j - 1:
                        z = F.relu(z)
            y = z if y is None else y + z
        fused.append(F.relu(y))
    return fused


def test_hrnet_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(90)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    mod = BACKBONES.get('HRNet')(extra=EXTRA, in_channels=3)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, 91)
    got = mod.apply(v, jnp.asarray(img), train=False)
    fv = _flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    x = F.relu(bn(_conv(x, fv, 'conv1', stride=2, padding=1), fv, 'bn1'))
    x = F.relu(bn(_conv(x, fv, 'conv2', stride=2, padding=1), fv, 'bn2'))
    x = _bottleneck(x, fv, 'layer1_0', downsample=True)
    xs = [x]

    for si, stage in enumerate(('stage2', 'stage3', 'stage4')):
        cfg = EXTRA[stage]
        chans = list(cfg['num_channels'])  # BASIC: expansion 1
        new_xs = []
        for i in range(cfg['num_branches']):
            if i < len(xs):
                if xs[i].shape[1] != chans[i]:
                    new_xs.append(_cm(xs[i], fv, f'transition{si}_{i}',
                                      padding=1))
                else:
                    new_xs.append(xs[i])
            else:
                new_xs.append(_cm(xs[-1], fv, f'transition{si}_{i}',
                                  stride=2, padding=1))
        xs = new_xs
        for m in range(cfg['num_modules']):
            xs = _hr_module(xs, fv, f'{stage}_{m}', cfg['num_branches'],
                            cfg['num_blocks'], chans, chans)

    assert len(got) == 4
    for g, e in zip(got, xs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# ResNeSt (reference resnest.py) — width=planes at groups=1, radix softmax,
# avg-pool strides, deep stem + avg_down shortcuts
# ---------------------------------------------------------------------------
def _split_attn(x, fv, p, radix=2):
    out = _conv(x, fv, f'{p}/conv', padding=1, groups=radix)
    out = F.relu(bn(out, fv, f'{p}/bn0'))
    b, rc = out.shape[:2]
    c = rc // radix
    splits = out.view(b, radix, c, *out.shape[2:])
    gap = F.adaptive_avg_pool2d(splits.sum(1), 1)
    gap = F.relu(bn(_conv(gap, fv, f'{p}/fc1'), fv, f'{p}/bn1'))
    atten = _conv(gap, fv, f'{p}/fc2')
    atten = F.softmax(atten.view(b, radix, c), dim=1).view(b, rc, 1, 1)
    attens = atten.view(b, radix, c, 1, 1)
    return (attens * splits).sum(1)


def _split_bottleneck(x, fv, p, planes, stride):
    out = F.relu(bn(_conv(x, fv, f'{p}/conv1'), fv, f'{p}/bn1'))
    out = _split_attn(out, fv, f'{p}/conv2')
    if stride > 1:
        out = F.avg_pool2d(out, 3, stride, padding=1)
    out = bn(_conv(out, fv, f'{p}/conv3'), fv, f'{p}/bn3')
    idn = x
    if x.shape[1] != planes * 4 or stride > 1:
        idn = x
        if stride > 1:
            idn = F.avg_pool2d(idn, stride, stride, ceil_mode=True,
                               count_include_pad=False)
        idn = bn(_conv(idn, fv, f'{p}/downsample/0'),
                 fv, f'{p}/downsample/1')
    return F.relu(out + idn)


# ---------------------------------------------------------------------------
# MobileNetV3 (reference mobilenet_v3.py) — adaptive padding, SE(HSigmoid
# 3/6), segmentation stride/dilation surgery, 576-wide final conv
# ---------------------------------------------------------------------------
def _adaptive_conv(x, w, stride, dilation, groups):
    ih, iw = x.shape[2:]
    k = w.shape[2]
    pad_h = max((-(-ih // stride) - 1) * stride + (k - 1) * dilation + 1 - ih,
                0)
    pad_w = max((-(-iw // stride) - 1) * stride + (k - 1) * dilation + 1 - iw,
                0)
    x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                  pad_h // 2, pad_h - pad_h // 2])
    return F.conv2d(x, w, None, stride=stride, dilation=dilation,
                    groups=groups)


def _mnv3_block(x, fv, p, k, mid, out_ch, with_se, act, arch_stride,
                dw_stride, dilation):
    from stc_unet_tpu.models.utils.inverted_residual import make_divisible
    a = F.hardswish if act == 'HSwish' else F.relu
    in_ch = x.shape[1]
    y = x
    if mid != in_ch:
        y = a(bn(_cm_noact(y, fv, f'{p}/expand_conv'), fv,
                 f'{p}/expand_conv/bn'))
    w = t(fv[f'params/{p}/depthwise_conv/conv_m/conv/kernel']
          .transpose(3, 2, 0, 1))
    if arch_stride == 2:
        y = _adaptive_conv(y, w, dw_stride, dilation, mid)
    else:
        y = F.conv2d(y, w, None, stride=dw_stride,
                     padding=dilation * (k // 2), dilation=dilation,
                     groups=mid)
    y = a(bn(y, fv, f'{p}/depthwise_conv/bn'))
    if with_se:
        s = F.adaptive_avg_pool2d(y, 1)
        s = F.relu(_conv(s, fv, f'{p}/se_reduce'))
        s = F.hardsigmoid(_conv(s, fv, f'{p}/se_expand'))
        y = y * s
    y = bn(_cm_noact(y, fv, f'{p}/linear_conv'), fv, f'{p}/linear_conv/bn')
    if arch_stride == 1 and in_ch == out_ch:
        y = x + y
    return y


def _cm_noact(x, fv, name, stride=1, padding=0):
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    return F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                    padding=padding)


def test_mobilenet_v3_small_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(94)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('MobileNetV3')(arch='small',
                                       out_indices=(0, 1, 12))
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, 95)
    got = mod.apply(v, jnp.asarray(img), train=False)
    fv = _flat(v)

    arch = [
        [3, 16, 16, True, 'ReLU', 2], [3, 72, 24, False, 'ReLU', 2],
        [3, 88, 24, False, 'ReLU', 1], [5, 96, 40, True, 'HSwish', 2],
        [5, 240, 40, True, 'HSwish', 1], [5, 240, 40, True, 'HSwish', 1],
        [5, 120, 48, True, 'HSwish', 1], [5, 144, 48, True, 'HSwish', 1],
        [5, 288, 96, True, 'HSwish', 2], [5, 576, 96, True, 'HSwish', 1],
        [5, 576, 96, True, 'HSwish', 1]]
    x = t(img.transpose(0, 3, 1, 2))
    w0 = t(fv['params/layer0/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    x = F.hardswish(bn(_adaptive_conv(x, w0, 2, 1, 1), fv, 'layer0/bn'))
    outs = [x]
    for i, (k, mid, out_ch, with_se, act, stride) in enumerate(arch):
        p = i + 1
        dilation = 1
        dw_stride = stride
        if p >= 4:
            dilation = 2 if p < 9 else 4
            if p in (4, 9):
                dw_stride = 1
        x = _mnv3_block(x, fv, f'layer{p}', k, mid, out_ch, with_se, act,
                        stride, dw_stride, dilation)
        if p == 1:
            outs.append(x)
    x = F.hardswish(bn(_cm_noact(x, fv, 'layer12'), fv, 'layer12/bn'))
    outs.append(x)

    assert len(got) == 3
    # output stride 8 after the surgery (layer4/layer9 strides dropped):
    # 64² input → 8² final map (without surgery it would be 2²)
    assert tuple(np.asarray(got[2]).shape[1:3]) == (8, 8)
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_resnest_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(92)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    mod = BACKBONES.get('ResNeSt')(
        depth=50, in_channels=3, stem_channels=8, base_channels=8,
        num_stages=4, out_indices=(0, 1, 2, 3))
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, 93)
    got = mod.apply(v, jnp.asarray(img), train=False)
    fv = _flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    for j, s in enumerate((2, 1, 1)):
        x = F.relu(bn(_conv(x, fv, f'stem_conv{j}', stride=s, padding=1),
                      fv, f'stem_bn{j}'))
    x = F.max_pool2d(x, 3, 2, padding=1)
    stage_blocks = (3, 4, 6, 3)
    outs = []
    for i, nb in enumerate(stage_blocks):
        planes = 8 * 2 ** i
        for j in range(nb):
            stride = (1, 2, 2, 2)[i] if j == 0 else 1
            x = _split_bottleneck(x, fv, f'layer{i + 1}_{j}', planes, stride)
        outs.append(x)

    assert len(got) == 4
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)
