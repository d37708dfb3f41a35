"""Torch-oracle forward goldens, backbone batch 4 (VERDICT r4 #4):
plain ResNet / V1c / V1d (the most config-used backbone — reference
``backbones/resnet.py:714``, ``utils/res_layer.py``) and MobileNetV2
(``backbones/mobilenet_v2.py``), at odd geometry with the DeepLab-style
dilated-stage recipes the stock configs use.

Protocol as batches 1-3: randomize flax weights, re-run the reference math
in plain torch on the same weights, rtol 1e-4.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_for_bb4',
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


def _cm(x, fv, name, stride=1, padding=0, dilation=1, groups=1,
        act='relu'):
    """ConvModule: conv_m/conv + bn (+act)."""
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                 padding=padding, dilation=dilation, groups=groups)
    x = bn(x, fv, f'{name}/bn')
    if act == 'relu':
        return F.relu(x)
    if act == 'relu6':
        return F.relu6(x)
    return x


def _run(mod, img, seed=21):
    v = mod.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(img),
                 train=False)
    v = _randomize(v, seed)
    got = mod.apply(v, jnp.asarray(img), train=False)
    return _flat(v), got


# ---------------------------------------------------------------- ResNet ----

def _basic_block(x, fv, p, stride, dilation, ds):
    idn = x
    out = F.relu(bn(_conv(x, fv, f'{p}/conv1', stride, padding=dilation,
                          dilation=dilation), fv, f'{p}/bn1'))
    out = bn(_conv(out, fv, f'{p}/conv2', 1, padding=1), fv, f'{p}/bn2')
    if ds:
        idn = _downsample_t(x, fv, p, stride)
    return F.relu(out + idn)


def _bottleneck(x, fv, p, stride, dilation, ds, avg_down=False):
    idn = x
    out = F.relu(bn(_conv(x, fv, f'{p}/conv1', 1), fv, f'{p}/bn1'))
    out = F.relu(bn(_conv(out, fv, f'{p}/conv2', stride, padding=dilation,
                          dilation=dilation), fv, f'{p}/bn2'))
    out = bn(_conv(out, fv, f'{p}/conv3', 1), fv, f'{p}/bn3')
    if ds:
        idn = _downsample_t(x, fv, p, stride, avg_down)
    return F.relu(out + idn)


def _downsample_t(x, fv, p, stride, avg_down=False):
    if avg_down and stride > 1:
        # reference res_layer.py:50-54: ceil_mode + count_include_pad=False
        x = F.avg_pool2d(x, stride, stride, ceil_mode=True,
                         count_include_pad=False)
        stride = 1
    x = _conv(x, fv, f'{p}/downsample/0', stride)
    return bn(x, fv, f'{p}/downsample/1')


def _resnet_torch(x, fv, depth, strides, dilations, deep_stem,
                  avg_down=False, contract_dilation=False, multi_grid=None,
                  base=8):
    blocks = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}[depth]
    expansion = 1 if depth == 18 else 4
    if deep_stem:
        x = F.relu(bn(_conv(x, fv, 'stem_conv0', 2, padding=1), fv,
                      'stem_bn0'))
        x = F.relu(bn(_conv(x, fv, 'stem_conv1', 1, padding=1), fv,
                      'stem_bn1'))
        x = F.relu(bn(_conv(x, fv, 'stem_conv2', 1, padding=1), fv,
                      'stem_bn2'))
    else:
        x = F.relu(bn(_conv(x, fv, 'conv1', 2, padding=3), fv, 'bn1'))
    x = F.max_pool2d(x, 3, 2, padding=1)
    outs = []
    in_ch = x.shape[1]
    for s in range(4):
        planes = base * 2 ** s
        mg = multi_grid if s == 3 else None
        for i in range(blocks[s]):
            if mg is not None:
                dil = mg[i]
            elif i == 0 and dilations[s] > 1 and contract_dilation:
                dil = dilations[s] // 2
            else:
                dil = dilations[s]
            stride = strides[s] if i == 0 else 1
            ds = i == 0 and (stride != 1 or in_ch != planes * expansion)
            p = f'layer{s + 1}/{i}'
            if depth == 18:
                x = _basic_block(x, fv, p, stride, dil, ds)
            else:
                x = _bottleneck(x, fv, p, stride, dil, ds, avg_down)
            in_ch = planes * expansion
        outs.append(x)
    return outs


def test_resnet18_v1c_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(40)
    img = rng.randn(1, 65, 65, 3).astype(np.float32)  # odd → pad paths
    mod = BACKBONES.get('ResNetV1c')(
        depth=18, base_channels=8, stem_channels=8,
        norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=41)
    outs = _resnet_torch(t(img.transpose(0, 3, 1, 2)), fv, 18,
                         (1, 2, 2, 2), (1, 1, 1, 1), deep_stem=True)
    assert len(got) == 4
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_resnet50_v1d_dilated_multigrid_oracle():
    """Bottleneck + V1d avg_down (ceil_mode pooling at odd size) + the
    DeepLab output-stride-16 recipe with contract_dilation and the mg124
    multi-grid (reference configs deeplabv3_r101-d16-mg124: multi_grid
    rates ARE the block dilations, res_layer.py:68-73,92)."""
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(42)
    img = rng.randn(1, 65, 65, 3).astype(np.float32)
    mod = BACKBONES.get('ResNetV1d')(
        depth=50, base_channels=8, stem_channels=8,
        strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
        contract_dilation=True, multi_grid=(1, 2, 4),
        norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=43)
    outs = _resnet_torch(t(img.transpose(0, 3, 1, 2)), fv, 50,
                         (1, 2, 2, 1), (1, 1, 1, 2), deep_stem=True,
                         avg_down=True, contract_dilation=True,
                         multi_grid=(1, 2, 4))
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_resnet50_caffe_oracle():
    """caffe style: stride moves to conv1 of the bottleneck
    (reference resnet.py:77-83)."""
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(44)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('ResNet')(
        depth=50, base_channels=8, stem_channels=8, style='caffe',
        norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=45)

    def _bneck_caffe(x, fv, p, stride, ds):
        idn = x
        out = F.relu(bn(_conv(x, fv, f'{p}/conv1', stride), fv, f'{p}/bn1'))
        out = F.relu(bn(_conv(out, fv, f'{p}/conv2', 1, padding=1), fv,
                        f'{p}/bn2'))
        out = bn(_conv(out, fv, f'{p}/conv3', 1), fv, f'{p}/bn3')
        if ds:
            idn = _downsample_t(x, fv, p, stride)
        return F.relu(out + idn)

    x = F.relu(bn(_conv(t(img.transpose(0, 3, 1, 2)), fv, 'conv1', 2,
                        padding=3), fv, 'bn1'))
    x = F.max_pool2d(x, 3, 2, padding=1)
    in_ch = x.shape[1]
    outs = []
    for s, nb in enumerate((3, 4, 6, 3)):
        planes = 8 * 2 ** s
        for i in range(nb):
            stride = (1, 2, 2, 2)[s] if i == 0 else 1
            ds = i == 0 and (stride != 1 or in_ch != planes * 4)
            x = _bneck_caffe(x, fv, f'layer{s + 1}/{i}', stride, ds)
            in_ch = planes * 4
        outs.append(x)
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- MobileNetV2 ----

def test_mobilenet_v2_oracle():
    """MobileNetV2 with the DeepLab dilated-stage surgery the stock
    configs apply (reference mobilenet_v2.py: strides/dilations per
    stage, ReLU6, linear bottleneck, residual iff stride 1 & same C)."""
    from stc_unet_tpu.models.builder import BACKBONES
    from stc_unet_tpu.models.utils.inverted_residual import make_divisible
    rng = np.random.RandomState(46)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    strides = (1, 2, 2, 1, 1, 1, 1)
    dilations = (1, 1, 1, 2, 2, 4, 4)
    mod = BACKBONES.get('MobileNetV2')(
        widen_factor=1.0, strides=strides, dilations=dilations,
        out_indices=(1, 2, 4, 6), norm_cfg=dict(type='BN'))
    fv, got = _run(mod, img, seed=47)

    arch = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4), (6, 96, 3),
            (6, 160, 3), (6, 320, 1)]
    x = _cm(t(img.transpose(0, 3, 1, 2)), fv, 'conv1', stride=2, padding=1,
            act='relu6')
    outs = []
    for i, (expand, channel, nb) in enumerate(arch):
        out_ch = make_divisible(channel * 1.0, 8)
        for j in range(nb):
            stride = strides[i] if j == 0 else 1
            p = f'layer{i + 1}_{j}'
            in_ch = x.shape[1]
            y = x
            if expand != 1:
                y = _cm(y, fv, f'{p}/expand_conv', act='relu6')
            hidden = y.shape[1]
            y = _cm(y, fv, f'{p}/depthwise_conv', stride=stride,
                    padding=dilations[i], dilation=dilations[i],
                    groups=hidden, act='relu6')
            y = _cm(y, fv, f'{p}/linear_conv', act=None)
            x = x + y if (stride == 1 and in_ch == out_ch) else y
        if i in (1, 2, 4, 6):
            outs.append(x)
    assert len(got) == 4
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)
