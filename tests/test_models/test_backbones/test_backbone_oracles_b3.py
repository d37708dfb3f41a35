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
