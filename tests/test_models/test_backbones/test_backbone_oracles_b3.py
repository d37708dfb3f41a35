"""Torch-oracle forward goldens, backbone batch 3: MiT / Segformer
(reference ``backbones/mit.py``: overlapping patch embeds, efficient MHA
with sr_ratio conv reduction of K/V, Mix-FFN) and STDC.

Protocol as batch 1/2: randomize flax weights, re-run the reference math in
plain torch on the same weights, rtol 1e-4.
"""
import importlib.util as _ilu
import os.path as _osp

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

_spec = _ilu.spec_from_file_location(
    'stock_head_oracles_for_bb3',
    _osp.join(_osp.dirname(_osp.dirname(_osp.abspath(__file__))),
              'test_heads', 'test_stock_head_oracles.py'))
_b1 = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_b1)

t, bn, _randomize, _flat = _b1.t, _b1.bn, _b1._randomize, _b1._flat


def _conv(x, fv, name, stride=1, padding=0, groups=1):
    w = t(fv[f'params/{name}/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv/bias')
    return F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                    padding=padding, groups=groups)


def _ln(x, fv, name, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), t(fv[f'params/{name}/scale']),
                        t(fv[f'params/{name}/bias']), eps=eps)


def _dense(x, fv, name):
    w = t(fv[f'params/{name}/kernel'])
    b = fv.get(f'params/{name}/bias')
    y = x @ w
    return y + t(b) if b is not None else y


def _eff_attn(x, fv, p, heads, sr, hw):
    b, n, c = x.shape
    h, w = hw
    hd = c // heads
    q = _dense(x, fv, f'{p}/q')
    kv_in = x
    if sr > 1:
        xr = x.transpose(1, 2).reshape(b, c, h, w)
        xr = _conv(xr, fv, f'{p}/sr', stride=sr)
        kv_in = xr.reshape(b, c, -1).transpose(1, 2)
        kv_in = _ln(kv_in, fv, f'{p}/sr_norm')
    kv = _dense(kv_in, fv, f'{p}/kv')
    m = kv_in.shape[1]
    k, v = kv[..., :c], kv[..., c:]
    q = q.reshape(b, n, heads, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, m, heads, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, m, heads, hd).permute(0, 2, 1, 3)
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    attn = F.softmax(attn, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, c)
    return _dense(out, fv, f'{p}/proj')


def _mix_ffn(x, fv, p, hidden, hw):
    b, n, c = x.shape
    h, w = hw
    x = _dense(x, fv, f'{p}/fc1')
    xr = x.transpose(1, 2).reshape(b, hidden, h, w)
    xr = _conv(xr, fv, f'{p}/dwconv', padding=1, groups=hidden)
    x = xr.reshape(b, hidden, n).transpose(1, 2)
    x = F.gelu(x)
    return _dense(x, fv, f'{p}/fc2')


def test_mit_oracle():
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(96)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    mod = BACKBONES.get('MixVisionTransformer')(
        embed_dims=8, num_layers=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        sr_ratios=(8, 4, 2, 1), drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0)
    rngs = {'params': jax.random.PRNGKey(0),
            'dropout': jax.random.PRNGKey(1)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, 97)
    got = mod.apply(v, jnp.asarray(img), train=False)
    fv = _flat(v)

    x = t(img.transpose(0, 3, 1, 2))
    outs = []
    for i, (k, s, heads, sr) in enumerate(
            zip((7, 3, 3, 3), (4, 2, 2, 2), (1, 2, 4, 8), (8, 4, 2, 1))):
        dim = 8 * heads
        x = _conv(x, fv, f'patch_embed{i}_proj', stride=s, padding=k // 2)
        b, c, h, w = x.shape
        tok = x.reshape(b, c, h * w).transpose(1, 2)
        tok = _ln(tok, fv, f'patch_embed{i}_norm')
        a = _ln(tok, fv, f'block{i}_0/norm1')
        tok = tok + _eff_attn(a, fv, f'block{i}_0/attn', heads, sr, (h, w))
        m = _ln(tok, fv, f'block{i}_0/norm2')
        tok = tok + _mix_ffn(m, fv, f'block{i}_0/ffn', dim * 4, (h, w))
        tok = _ln(tok, fv, f'norm{i}')
        x = tok.transpose(1, 2).reshape(b, c, h, w)
        outs.append(x)

    assert len(got) == 4
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ STDC ----

def _cm2(x, fv, name, stride=1, padding=0, groups=1, act=True, norm=True):
    """ConvModule ≙ conv(+BN eval)(+ReLU), with stride/groups."""
    w = t(fv[f'params/{name}/conv_m/conv/kernel'].transpose(3, 2, 0, 1))
    b = fv.get(f'params/{name}/conv_m/conv/bias')
    x = F.conv2d(x, w, t(b) if b is not None else None, stride=stride,
                 padding=padding, groups=groups)
    if norm:
        x = bn(x, fv, f'{name}/bn')
    return F.relu(x) if act else x


def _stdc_module(x, fv, p, oc, stride, fusion, num_convs=4):
    """Reference STDCModule forward (stdc.py:96-128) in plain torch."""
    down = stride == 2
    x0 = _cm2(x, fv, f'{p}/conv0')
    if fusion == 'add':
        h = x0
        if down:
            h = _cm2(x0, fv, f'{p}/downsample', stride=2, padding=1,
                     groups=oc // 2, act=False)
            skip = _cm2(x, fv, f'{p}/skip0', stride=2, padding=1,
                        groups=x.shape[1], act=False)
            skip = _cm2(skip, fv, f'{p}/skip1', act=False)
        else:
            skip = x
        feats = [h]
        for i in range(1, num_convs):
            h = _cm2(h, fv, f'{p}/conv{i}', padding=1)
            feats.append(h)
        return torch.cat(feats, 1) + skip
    if down:
        h = _cm2(x0, fv, f'{p}/downsample', stride=2, padding=1,
                 groups=oc // 2, act=False)
        first = F.avg_pool2d(x0, 3, 2, padding=1)
    else:
        h = x0
        first = x0
    feats = [first]
    for i in range(1, num_convs):
        h = _cm2(h, fv, f'{p}/conv{i}', padding=1)
        feats.append(h)
    return torch.cat(feats, 1)


def _stdc_net(x, fv, channels, fusion, prefix='', repeats=(1, 1, 1)):
    x = _cm2(x, fv, f'{prefix}stem0', stride=2, padding=1)
    x = _cm2(x, fv, f'{prefix}stem1', stride=2, padding=1)
    outs = []
    for i, rep in enumerate(repeats):
        for j in range(rep + 1):
            x = _stdc_module(x, fv, f'{prefix}stage{i}_{j}',
                             channels[i + 2], 2 if j == 0 else 1, fusion)
        outs.append(x)
    return outs


def _build_stdc(fusion, with_final_conv=False):
    from stc_unet_tpu.models.builder import BACKBONES
    return BACKBONES.get('STDCNet')(
        stdc_type='STDCNet1', in_channels=3,
        channels=(8, 16, 32, 64, 128), bottleneck_type=fusion,
        norm_cfg=dict(type='BN'), act_cfg=dict(type='ReLU'),
        num_convs=4, with_final_conv=with_final_conv)


def _stdc_run(mod, img, seed=11):
    rngs = {'params': jax.random.PRNGKey(0)}
    v = mod.init(rngs, jnp.asarray(img), train=False)
    v = _randomize(v, seed)
    got = mod.apply(v, jnp.asarray(img), train=False)
    return _flat(v), got


def test_stdc_cat_oracle():
    rng = np.random.RandomState(30)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    fv, got = _stdc_run(_build_stdc('cat'), img)
    outs = _stdc_net(t(img.transpose(0, 3, 1, 2)), fv,
                     (8, 16, 32, 64, 128), 'cat')
    assert len(got) == 3
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_stdc_add_oracle():
    rng = np.random.RandomState(31)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    fv, got = _stdc_run(_build_stdc('add'), img, seed=12)
    outs = _stdc_net(t(img.transpose(0, 3, 1, 2)), fv,
                     (8, 16, 32, 64, 128), 'add')
    for g, e in zip(got, outs):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)


def test_stdc_final_conv_oracle():
    rng = np.random.RandomState(32)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    fv, got = _stdc_run(_build_stdc('cat', with_final_conv=True), img,
                        seed=13)
    outs = _stdc_net(t(img.transpose(0, 3, 1, 2)), fv,
                     (8, 16, 32, 64, 128), 'cat')
    outs[-1] = _cm2(outs[-1], fv, 'final_conv')
    assert got[-1].shape[-1] == 1024  # max(1024, channels[-1])
    np.testing.assert_allclose(
        np.asarray(got[-1], np.float32).transpose(0, 3, 1, 2),
        outs[-1].numpy(), rtol=1e-4, atol=1e-4)


def test_stdc_context_path_oracle():
    """STDCContextPathNet (reference stdc.py:394-422): conv_avg context,
    two ARM+refine hops (resize BEFORE the refine conv), FFM with the
    two-conv squeeze attention, output order (outs0, arm0, arm1, fuse)."""
    from stc_unet_tpu.models.builder import BACKBONES
    rng = np.random.RandomState(33)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    mod = BACKBONES.get('STDCContextPathNet')(
        backbone_cfg=dict(type='STDCNet', stdc_type='STDCNet1',
                          in_channels=3, channels=(8, 16, 32, 64, 128),
                          bottleneck_type='cat', norm_cfg=dict(type='BN'),
                          act_cfg=dict(type='ReLU'), num_convs=4,
                          with_final_conv=False),
        last_in_channels=(128, 64), out_channels=16,
        ffm_cfg=dict(in_channels=48, out_channels=32, scale_factor=4))
    fv, got = _stdc_run(mod, img, seed=14)

    x = t(img.transpose(0, 3, 1, 2))
    outs = _stdc_net(x, fv, (8, 16, 32, 64, 128), 'cat',
                     prefix='STDCNet_0/')
    avg = outs[-1].mean(dim=(2, 3), keepdim=True)
    avg_feat = _cm2(avg, fv, 'conv_avg')
    feature_up = F.interpolate(avg_feat, size=outs[-1].shape[2:],
                               mode='nearest')
    arms_out = []
    for i in range(2):
        inp = outs[-1 - i]
        a = _cm2(inp, fv, f'arm{i}/conv', padding=1)
        att = a.mean(dim=(2, 3), keepdim=True)
        att = torch.sigmoid(_cm2(att, fv, f'arm{i}/att_conv', act=False))
        x_arm = a * att + feature_up
        feature_up = F.interpolate(x_arm, size=outs[-2 - i].shape[2:],
                                   mode='nearest')
        feature_up = _cm2(feature_up, fv, f'conv{i}', padding=1)
        arms_out.append(feature_up)
    fuse_in = torch.cat([outs[0], arms_out[1]], 1)
    fx = _cm2(fuse_in, fv, 'ffm/conv0')
    att = fx.mean(dim=(2, 3), keepdim=True)
    att = _cm2(att, fv, 'ffm/att0', norm=False)
    att = torch.sigmoid(_cm2(att, fv, 'ffm/att1', norm=False, act=False))
    fuse = fx * att + fx
    expected = [outs[0]] + arms_out + [fuse]
    assert len(got) == 4
    for g, e in zip(got, expected):
        np.testing.assert_allclose(
            np.asarray(g, np.float32).transpose(0, 3, 1, 2), e.numpy(),
            rtol=1e-4, atol=1e-4)
