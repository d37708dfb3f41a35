"""Torch-oracle forward goldens for the quirky lightweight backbones —
CGNet first (reference ``backbones/cgnet.py``): learned PReLU activations,
stacked AvgPool input injections at /2 and /4, stage concats with the
first (downsampling) block's output — stage 1 as (x, down1, inp_4x),
stage 2 in the REVERSED (down2, x) order — and the CG block's dual
depthwise context extractors + global gate.

Protocol: randomize the flax module's weights, re-run the reference math
in plain torch on the same weights, require parity at rtol 1e-4.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_b1',
    _osp.join(_osp.dirname(_osp.dirname(_osp.abspath(__file__))),
              'test_heads', 'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

t, conv, bn = _b1.t, _b1.conv, _b1.bn


def _prelu(x, fv, name):
    return F.prelu(x, t(fv[f'params/{name}/weight']))


def _linear(x, fv, name):
    return x @ t(fv[f'params/{name}/linear/kernel']) + \
        t(fv[f'params/{name}/linear/bias'])


def _cm_prelu(x, fv, p, k, stride=1):
    w = t(fv[f'params/{p}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    x = F.conv2d(x, w, None, stride=stride, padding=(k - 1) // 2)
    x = bn(x, fv, f'{p}/bn')
    return _prelu(x, fv, f'{p}/activate')


def _cg_block(x, fv, p, out_ch, dilation, reduction, downsample):
    channels = out_ch if downsample else out_ch // 2
    g = _cm_prelu(x, fv, f'{p}/conv1x1', 3 if downsample else 1,
                  stride=2 if downsample else 1)
    wl = t(fv[f'params/{p}/f_loc/conv/kernel'].transpose(3, 2, 0, 1))
    loc = F.conv2d(g, wl, None, padding=1, groups=channels)
    ws = t(fv[f'params/{p}/f_sur/conv/kernel'].transpose(3, 2, 0, 1))
    sur = F.conv2d(g, ws, None, padding=dilation, dilation=dilation,
                   groups=channels)
    joi = torch.cat([loc, sur], 1)
    joi = bn(joi, fv, f'{p}/bn')
    joi = _prelu(joi, fv, f'{p}/activate')
    if downsample:
        wb = t(fv[f'params/{p}/bottleneck/conv/kernel']
               .transpose(3, 2, 0, 1))
        joi = F.conv2d(joi, wb, None)
    s = joi.mean((2, 3))
    s = F.relu(_linear(s, fv, f'{p}/fc1'))
    s = torch.sigmoid(_linear(s, fv, f'{p}/fc2'))
    out = joi * s[:, :, None, None]
    if not downsample:
        out = x + out
    return out


def test_cgnet_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(80)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    mod = BACKBONES.get('CGNet')(
        in_channels=3, num_channels=(8, 16, 32), num_blocks=(2, 3),
        dilations=(2, 4), reductions=(4, 8))
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _b1._randomize(v, 80)
    outs = mod.apply(v, jnp.asarray(img), train=False)
    fv = _b1._flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    inp_2x = F.avg_pool2d(x, 3, stride=2, padding=1,
                          count_include_pad=True)
    inp_4x = F.avg_pool2d(inp_2x, 3, stride=2, padding=1,
                          count_include_pad=True)
    cur = x
    for i in range(3):
        cur = _cm_prelu(cur, fv, f'stem_{i}', 3, stride=2 if i == 0 else 1)
    cur = torch.cat([cur, inp_2x], 1)
    cur = _prelu(bn(cur, fv, 'norm_prelu_0/norm'), fv,
                 'norm_prelu_0/activate')
    expected = [cur]
    for si, (nb, ch, dil, red) in enumerate(
            (((2, 16, 2, 4)), (3, 32, 4, 8))):
        first = None
        for j in range(nb):
            cur = _cg_block(cur, fv, f'level{si + 1}_{j}', ch, dil, red,
                            downsample=(j == 0))
            if j == 0:
                first = cur
        if si == 0:
            cat = torch.cat([cur, first, inp_4x], 1)
        else:
            cat = torch.cat([first, cur], 1)
        cur = _prelu(bn(cat, fv, f'norm_prelu_{si + 1}/norm'), fv,
                     f'norm_prelu_{si + 1}/activate')
        expected.append(cur)
    for i in range(3):
        got = np.asarray(outs[i], np.float32).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, expected[i].numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f'cgnet stage {i}')


# ---------------------------------------------------------------------------
# BiSeNetV2 (reference bisenetv2.py: stem, GE layers with the 2-conv
# strided expansion, 4-layer last stage, separate CE output, BGA fusion)
# ---------------------------------------------------------------------------
def _cm(x, fv, p, k=3, stride=1, groups=1, act='relu', pad=None):
    w = t(fv[f'params/{p}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b_ = fv.get(f'params/{p}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b_) if b_ is not None else None, stride=stride,
                 padding=(k - 1) // 2 if pad is None else pad,
                 groups=groups)
    if f'params/{p}/bn/scale' in fv:
        x = bn(x, fv, f'{p}/bn')
    if act == 'relu':
        x = F.relu(x)
    elif act == 'sigmoid':
        x = torch.sigmoid(x)
    return x


def _dwsep(x, fv, p, stride=1):
    """our DepthwiseSeparableConvModule param layout: {p}/depthwise,
    {p}/pointwise (both ConvModules)."""
    cin = x.shape[1]
    x = _cm(x, fv, f'{p}/depthwise_conv', 3, stride=stride, groups=cin,
            act=None)
    return _cm(x, fv, f'{p}/pointwise_conv', 1, act=None)


def _ge_layer(x, fv, p, out_ch, exp, stride):
    cin = x.shape[1]
    identity = x
    x = _cm(x, fv, f'{p}/conv1', 3)
    if stride == 1:
        x = _cm(x, fv, f'{p}/dwconv', 3, groups=cin)
    else:
        x = _cm(x, fv, f'{p}/dwconv_0', 3, stride=2, groups=cin, act=None)
        x = _cm(x, fv, f'{p}/dwconv_1', 3, groups=cin * exp)
    x = _cm(x, fv, f'{p}/conv2', 1, act=None)
    if stride == 1:
        x = x + identity
    else:
        x = x + _dwsep(identity, fv, f'{p}/shortcut', stride=2)
    return F.relu(x)


def test_bisenetv2_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(81)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    sem = (4, 8, 16, 16)
    det = (8, 8, 16)
    mod = BACKBONES.get('BiSeNetV2')(
        in_channels=3, detail_channels=det, semantic_channels=sem,
        semantic_expansion_ratio=2, bga_channels=16)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _b1._randomize(v, 81)
    outs = mod.apply(v, jnp.asarray(img), train=False)
    fv = _b1._flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    # detail branch
    d = x
    for i in range(3):
        d = _cm(d, fv, f'detail/stage{i}_0', 3, stride=2)
        d = _cm(d, fv, f'detail/stage{i}_1', 3)
    # semantic stem
    s = _cm(x, fv, 'semantic/stem_conv', 3, stride=2)
    left = _cm(s, fv, 'semantic/stem_left1', 1)
    left = _cm(left, fv, 'semantic/stem_left2', 3, stride=2)
    right = F.max_pool2d(s, 3, 2, padding=1)
    s = _cm(torch.cat([left, right], 1), fv, 'semantic/stem_fuse', 3)
    sem_outs = [s]
    for i in range(1, 4):
        depth = 4 if i == 3 else 2
        for j in range(depth):
            s = _ge_layer(s, fv, f'semantic/ge{i}_{j}', sem[i], 2,
                          2 if j == 0 else 1)
        sem_outs.append(s)
    gap = s.mean((2, 3), keepdim=True)
    gap = bn(gap, fv, 'semantic/ce_bn')
    gap = _cm(gap, fv, 'semantic/ce_conv', 1)
    ce = _cm(s + gap, fv, 'semantic/ce_out', 3)
    # BGA
    d_a = _cm(d, fv, 'bga_d_dw', 3, groups=d.shape[1], act=None)
    d_a = _cm(d_a, fv, 'bga_d_pw', 1, act=None)
    d_b = _cm(d, fv, 'bga_d_down', 3, stride=2, act=None)
    d_b = F.avg_pool2d(d_b, 3, 2, padding=1)
    s_a = _cm(ce, fv, 'bga_s_dw', 3, groups=ce.shape[1], act=None)
    s_a = _cm(s_a, fv, 'bga_s_pw', 1, act='sigmoid')
    s_b = _cm(ce, fv, 'bga_s_conv', 3, act=None)
    s_b = torch.sigmoid(F.interpolate(s_b, size=d.shape[2:],
                                      mode='bilinear', align_corners=False))
    left = d_a * s_b
    right = F.interpolate(d_b * s_a, size=d.shape[2:], mode='bilinear',
                          align_corners=False)
    fuse = _cm(left + right, fv, 'bga_out', 3)
    expected = [fuse] + sem_outs
    for i in range(5):
        got = np.asarray(outs[i], np.float32).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, expected[i].numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f'bisenetv2 out {i}')


# ---------------------------------------------------------------------------
# BiSeNetV1 (reference bisenetv1.py: spatial path, ARM context path with
# global-pool prior, nearest upsampling, FFM with conv+BN+ReLU+sigmoid gate)
# ---------------------------------------------------------------------------
def test_bisenetv1_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(82)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    ctx = (8, 16, 32)
    mod = BACKBONES.get('BiSeNetV1')(
        backbone_cfg=dict(type='ResNet', depth=18, base_channels=4,
                          num_stages=4, out_indices=(0, 1, 2, 3)),
        in_channels=3, spatial_channels=(4, 4, 4, 8),
        context_channels=ctx, out_channels=16)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _b1._randomize(v, 82)
    outs = mod.apply(v, jnp.asarray(img), train=False)
    fv = _b1._flat(v)

    # spatial path in torch is heavy to replicate with the resnet inside;
    # instead, feed the torch oracle the FLAX backbone's own features —
    # this isolates the BiSeNetV1 glue (ARMs, gap prior, nearest resizes,
    # FFM) which is what this oracle certifies. (ResNet itself is covered
    # by its own branch tests + converted-checkpoint goldens.)
    from stc_unet_tpu.models.builder import BACKBONES as REG
    import flax
    from flax import traverse_util
    inner = REG.build(dict(type='ResNet', depth=18, base_channels=4,
                           num_stages=4, out_indices=(0, 1, 2, 3)))
    flat = traverse_util.flatten_dict(flax.core.unfreeze(v))
    sub = {('params',) + k[2:]: lv for k, lv in flat.items()
           if k[0] == 'params' and k[1] == 'ResNet_0'}
    sub.update({('batch_stats',) + k[2:]: lv for k, lv in flat.items()
                if k[0] == 'batch_stats' and k[1] == 'ResNet_0'})
    feats = inner.apply(traverse_util.unflatten_dict(sub),
                        jnp.asarray(img), train=False)
    x8, x16, x32 = [t(np.asarray(f, np.float32).transpose(0, 3, 1, 2))
                    for f in feats[1:]]

    def _arm(x, p):
        x = _cm(x, fv, f'{p}/conv', 3)
        att = x.mean((2, 3), keepdim=True)
        att = _cm(att, fv, f'{p}/att_conv', 1, act='sigmoid')
        return x * att

    gap = x32.mean((2, 3), keepdim=True)
    gap = _cm(gap, fv, 'gap_conv', 1)
    c32 = _arm(x32, 'arm32') + gap
    c32 = F.interpolate(c32, size=x16.shape[2:], mode='nearest')
    c32 = _cm(c32, fv, 'refine32', 3)
    c16 = _arm(x16, 'arm16') + c32
    c16 = F.interpolate(c16, size=x8.shape[2:], mode='nearest')
    c16 = _cm(c16, fv, 'refine16', 3)

    sp = t(img.transpose(0, 3, 1, 2))
    for i in range(4):
        k, s = ((7, 2) if i == 0 else (3, 2)) if i < 3 else (1, 1)
        sp = _cm(sp, fv, f'spatial_{i}', k, stride=s)
    cat = torch.cat([sp, c16], 1)
    fuse = _cm(cat, fv, 'ffm_conv', 1)
    att = fuse.mean((2, 3), keepdim=True)
    att = torch.sigmoid(_cm(att, fv, 'ffm_att', 1))
    fuse = fuse + fuse * att

    for i, exp in enumerate((fuse, c16, c32)):
        got = np.asarray(outs[i], np.float32).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, exp.numpy(), rtol=1e-4, atol=1e-4,
                                   err_msg=f'bisenetv1 out {i}')
