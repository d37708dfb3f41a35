"""Official-checkpoint converter tests (≙ reference
``tools/model_converters/*2mmseg.py`` coverage).

Each family: synthesize an official-layout torch ``state_dict`` with the
right shapes, convert, merge into a freshly-initialized flax backbone and
run a forward pass. ViT additionally gets a numerical parity check against
a hand-rolled timm-style torch forward (validates qkv packing order and
layout transposes, not just key names).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stc_unet_tpu.models import build_backbone
from stc_unet_tpu.utils.backbone_convert import (
    convert_beit, convert_mit, convert_stdc, convert_swin, convert_twins,
    convert_vit, merge_pretrained)


def _t(*shape, seed=0):
    g = torch.Generator().manual_seed(seed + sum(shape))
    return torch.randn(*shape, generator=g) * 0.05


def _init(model, x):
    return model.init(jax.random.PRNGKey(0), x)


def _names(paths):
    return {'/'.join(p) for p in paths}


# ---------------------------------------------------------------- ViT ----

def _vit_sd(embed=32, layers=2, patch=16, grid=4):
    sd = {
        'patch_embed.proj.weight': _t(embed, 3, patch, patch),
        'patch_embed.proj.bias': _t(embed),
        'pos_embed': _t(1, grid * grid + 1, embed),
        'cls_token': _t(1, 1, embed),
        'norm.weight': torch.ones(embed) + _t(embed),
        'norm.bias': _t(embed),
        'head.weight': _t(10, embed), 'head.bias': _t(10),
    }
    for i in range(layers):
        sd.update({
            f'blocks.{i}.norm1.weight': torch.ones(embed) + _t(embed, seed=i),
            f'blocks.{i}.norm1.bias': _t(embed, seed=i + 1),
            f'blocks.{i}.attn.qkv.weight': _t(3 * embed, embed, seed=i),
            f'blocks.{i}.attn.qkv.bias': _t(3 * embed, seed=i),
            f'blocks.{i}.attn.proj.weight': _t(embed, embed, seed=i),
            f'blocks.{i}.attn.proj.bias': _t(embed, seed=i),
            f'blocks.{i}.norm2.weight': torch.ones(embed) + _t(embed, seed=i),
            f'blocks.{i}.norm2.bias': _t(embed, seed=i + 2),
            f'blocks.{i}.mlp.fc1.weight': _t(4 * embed, embed, seed=i),
            f'blocks.{i}.mlp.fc1.bias': _t(4 * embed, seed=i),
            f'blocks.{i}.mlp.fc2.weight': _t(embed, 4 * embed, seed=i),
            f'blocks.{i}.mlp.fc2.bias': _t(embed, seed=i),
        })
    return sd


def _torch_vit_forward(sd, x_nchw, embed=32, layers=2, heads=2, patch=16):
    """timm-style ViT forward in torch (pre-LN, packed qkv, exact GELU)."""
    import torch.nn.functional as F
    x = F.conv2d(x_nchw, sd['patch_embed.proj.weight'],
                 sd['patch_embed.proj.bias'], stride=patch)
    b, c, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)
    cls = sd['cls_token'].expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + sd['pos_embed']
    hd = embed // heads
    for i in range(layers):
        y = F.layer_norm(x, (embed,), sd[f'blocks.{i}.norm1.weight'],
                         sd[f'blocks.{i}.norm1.bias'], eps=1e-6)
        qkv = F.linear(y, sd[f'blocks.{i}.attn.qkv.weight'],
                       sd[f'blocks.{i}.attn.qkv.bias'])
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, embed)
        y = F.linear(y, sd[f'blocks.{i}.attn.proj.weight'],
                     sd[f'blocks.{i}.attn.proj.bias'])
        x = x + y
        y = F.layer_norm(x, (embed,), sd[f'blocks.{i}.norm2.weight'],
                         sd[f'blocks.{i}.norm2.bias'], eps=1e-6)
        y = F.gelu(F.linear(y, sd[f'blocks.{i}.mlp.fc1.weight'],
                            sd[f'blocks.{i}.mlp.fc1.bias']))
        y = F.linear(y, sd[f'blocks.{i}.mlp.fc2.weight'],
                     sd[f'blocks.{i}.mlp.fc2.bias'])
        x = x + y
    x = F.layer_norm(x, (embed,), sd['norm.weight'], sd['norm.bias'],
                     eps=1e-6)
    return x[:, 1:].reshape(b, h, w, embed)


def test_vit_convert_numerical_parity():
    sd = _vit_sd()
    model = build_backbone(dict(
        type='VisionTransformer', img_size=64, patch_size=16, embed_dims=32,
        num_layers=2, num_heads=2, out_indices=(1,), final_norm=True))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_vit(sd))
    assert not info['missing'] and not info['unexpected'], info
    ours = np.asarray(model.apply(merged, jnp.asarray(x))[-1])
    ref = _torch_vit_forward(
        sd, torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_vit_pos_embed_resize():
    sd = _vit_sd(grid=7)  # pretrained at a different resolution
    model = build_backbone(dict(
        type='VisionTransformer', img_size=64, patch_size=16, embed_dims=32,
        num_layers=2, num_heads=2, out_indices=(1,), final_norm=True))
    template = _init(model, jnp.zeros((1, 64, 64, 3)))
    merged, info = merge_pretrained(template, convert_vit(sd))
    assert _names(info['resized']) == {'params/pos_embed'}
    model.apply(merged, jnp.zeros((1, 64, 64, 3)))


# --------------------------------------------------------------- Swin ----

def _swin_sd(embed=32, depths=(2, 2), heads=(2, 4), window=7):
    sd = {
        'patch_embed.proj.weight': _t(embed, 3, 4, 4),
        'patch_embed.proj.bias': _t(embed),
        'patch_embed.norm.weight': torch.ones(embed),
        'patch_embed.norm.bias': _t(embed),
        'norm.weight': torch.ones(embed * 2 ** (len(depths) - 1)),
        'norm.bias': _t(embed * 2 ** (len(depths) - 1)),
        'head.weight': _t(10, embed * 2), 'head.bias': _t(10),
    }
    tbl = (2 * window - 1) ** 2
    for s, (d, nh) in enumerate(zip(depths, heads)):
        c = embed * 2 ** s
        for j in range(d):
            p = f'layers.{s}.blocks.{j}'
            sd.update({
                f'{p}.norm1.weight': torch.ones(c), f'{p}.norm1.bias': _t(c),
                f'{p}.attn.relative_position_bias_table': _t(tbl, nh),
                f'{p}.attn.relative_position_index':
                    torch.zeros(window * window, window * window).long(),
                f'{p}.attn.qkv.weight': _t(3 * c, c, seed=s * 7 + j),
                f'{p}.attn.qkv.bias': _t(3 * c),
                f'{p}.attn.proj.weight': _t(c, c, seed=s + j),
                f'{p}.attn.proj.bias': _t(c),
                f'{p}.norm2.weight': torch.ones(c), f'{p}.norm2.bias': _t(c),
                f'{p}.mlp.fc1.weight': _t(4 * c, c, seed=j),
                f'{p}.mlp.fc1.bias': _t(4 * c),
                f'{p}.mlp.fc2.weight': _t(c, 4 * c, seed=j),
                f'{p}.mlp.fc2.bias': _t(c),
            })
        if s < len(depths) - 1:
            sd[f'layers.{s}.downsample.norm.weight'] = torch.ones(4 * c)
            sd[f'layers.{s}.downsample.norm.bias'] = _t(4 * c)
            sd[f'layers.{s}.downsample.reduction.weight'] = \
                _t(2 * c, 4 * c, seed=s)
    return sd


def test_swin_convert():
    sd = _swin_sd(window=7)
    model = build_backbone(dict(
        type='SwinTransformer', embed_dims=32, depths=(2, 2),
        num_heads=(2, 4), window_size=7, out_indices=(0, 1)))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_swin(sd))
    # classification ckpts only carry the final-stage norm
    assert _names(info['missing']) == {'params/norm0/scale',
                                       'params/norm0/bias'}
    assert not info['unexpected'], info['unexpected']
    outs = model.apply(merged, x)
    assert outs[-1].shape[-1] == 64


def _swin_rel_index(window):
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing='ij'))
    cf = coords.reshape(2, -1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return torch.from_numpy(rel.sum(-1)).long()


def _torch_swin_block(x, sd, p, c, heads, window, shift, hw):
    """mmseg SwinBlock semantics (reference swin.py:180-378): pad the
    norm1 output to a window multiple INSIDE the block, shifted-window
    attention with the mask computed over the padded canvas, crop back."""
    import torch.nn.functional as F
    h, w = hw
    b = x.shape[0]
    shortcut = x
    y = F.layer_norm(x, (c,), sd[f'{p}.norm1.weight'], sd[f'{p}.norm1.bias'])
    y = y.view(b, h, w, c)
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    y = F.pad(y, (0, 0, 0, pad_r, 0, pad_b))
    hp, wp = h + pad_b, w + pad_r
    mask = None
    if shift:
        y = torch.roll(y, (-shift, -shift), dims=(1, 2))
        img_mask = torch.zeros(1, hp, wp, 1)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws_ in (slice(0, -window), slice(-window, -shift),
                        slice(-shift, None)):
                img_mask[:, hs, ws_, :] = cnt
                cnt += 1
        mw = img_mask.view(1, hp // window, window, wp // window, window, 1)
        mw = mw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
        mask = mw.unsqueeze(1) - mw.unsqueeze(2)
        mask = mask.masked_fill(mask != 0, -100.0)
    yw = y.view(b, hp // window, window, wp // window, window, c)
    yw = yw.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    qkv = F.linear(yw, sd[f'{p}.attn.qkv.weight'], sd[f'{p}.attn.qkv.bias'])
    B_, N = yw.shape[:2]
    hd = c // heads
    qkv = qkv.reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1)
    idx = _swin_rel_index(window)
    bias = sd[f'{p}.attn.relative_position_bias_table'][idx.view(-1)]
    attn = attn + bias.view(N, N, heads).permute(2, 0, 1).unsqueeze(0)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.view(B_ // nw, nw, heads, N, N) + \
            mask.unsqueeze(1).unsqueeze(0)
        attn = attn.view(-1, heads, N, N)
    attn = attn.softmax(-1)
    yw = (attn @ v).transpose(1, 2).reshape(B_, N, c)
    yw = F.linear(yw, sd[f'{p}.attn.proj.weight'], sd[f'{p}.attn.proj.bias'])
    y = yw.view(b, hp // window, wp // window, window, window, c)
    y = y.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if shift:
        y = torch.roll(y, (shift, shift), dims=(1, 2))
    y = y[:, :h, :w].reshape(b, h * w, c)
    x = shortcut + y
    shortcut = x
    y = F.layer_norm(x, (c,), sd[f'{p}.norm2.weight'], sd[f'{p}.norm2.bias'])
    y = F.gelu(F.linear(y, sd[f'{p}.mlp.fc1.weight'],
                        sd[f'{p}.mlp.fc1.bias']))
    y = F.linear(y, sd[f'{p}.mlp.fc2.weight'], sd[f'{p}.mlp.fc2.bias'])
    return shortcut + y


def _torch_swin_forward(sd, x_nchw, embed=32, depths=(2, 2, 2),
                        heads=(2, 4, 8), window=7):
    import torch.nn.functional as F
    x = F.conv2d(x_nchw, sd['patch_embed.proj.weight'],
                 sd['patch_embed.proj.bias'], stride=4)
    b, c, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = F.layer_norm(x, (c,), sd['patch_embed.norm.weight'],
                     sd['patch_embed.norm.bias'])
    outs = []
    for s, (d, nh) in enumerate(zip(depths, heads)):
        c = embed * 2 ** s
        for j in range(d):
            x = _torch_swin_block(x, sd, f'layers.{s}.blocks.{j}', c, nh,
                                  window, (window // 2) if j % 2 else 0,
                                  (h, w))
        nk = f'norm{s}' if f'norm{s}.weight' in sd else 'norm'
        if s == len(depths) - 1 or f'norm{s}.weight' in sd:
            out = F.layer_norm(x, (c,), sd[f'{nk}.weight'], sd[f'{nk}.bias'])
        else:
            out = x
        outs.append(out.view(b, h, w, c))
        if s < len(depths) - 1:
            # PatchMerging: pad to even (corner), official x00/x10/x01/x11
            # concat order, LN then bias-free reduction
            y = x.view(b, h, w, c)
            if h % 2 or w % 2:
                y = F.pad(y, (0, 0, 0, w % 2, 0, h % 2))
            h2, w2 = (h + h % 2) // 2, (w + w % 2) // 2
            x0 = y[:, 0::2, 0::2]
            x1 = y[:, 1::2, 0::2]
            x2 = y[:, 0::2, 1::2]
            x3 = y[:, 1::2, 1::2]
            y = torch.cat([x0, x1, x2, x3], -1).view(b, h2 * w2, 4 * c)
            y = F.layer_norm(y, (4 * c,),
                             sd[f'layers.{s}.downsample.norm.weight'],
                             sd[f'layers.{s}.downsample.norm.bias'])
            x = F.linear(y, sd[f'layers.{s}.downsample.reduction.weight'])
            h, w = h2, w2
    return outs


def test_swin_convert_numerical_parity():
    """Full torch-forward oracle for the Swin BACKBONE (VERDICT r4 #3):
    shift masks, relative bias, per-block pad-to-window (mmseg semantics),
    odd-size PatchMerging padding, stage norms — at a geometry where
    nothing divides evenly (40² → 10x10 / 5x5 / 3x3 tokens, window 7)."""
    depths, heads = (2, 2, 2), (2, 4, 8)
    sd = _swin_sd(depths=depths, heads=heads, window=7)
    # randomize rel-bias tables (zeros wouldn't discriminate index bugs)
    for k in list(sd):
        if k.endswith('relative_position_bias_table'):
            sd[k] = _t(*sd[k].shape, seed=hash(k) % 997)
    # add the per-stage norms an mmseg seg ckpt carries so every stage
    # output is value-comparable
    for s in range(len(depths) - 1):
        c = 32 * 2 ** s
        sd[f'norm{s}.weight'] = torch.ones(c) + _t(c, seed=s)
        sd[f'norm{s}.bias'] = _t(c, seed=s + 5)
    model = build_backbone(dict(
        type='SwinTransformer', embed_dims=32, depths=depths,
        num_heads=heads, window_size=7, out_indices=(0, 1, 2),
        drop_path_rate=0.0))
    x = np.random.RandomState(7).rand(2, 40, 40, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_swin(sd))
    assert not info['missing'] and not info['unexpected'], info
    outs = model.apply(merged, jnp.asarray(x))
    refs = _torch_swin_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               depths=depths, heads=heads)
    assert len(outs) == 3
    for g, e in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_swin_rel_table_resize():
    sd = _swin_sd(window=7)
    model = build_backbone(dict(
        type='SwinTransformer', embed_dims=32, depths=(2, 2),
        num_heads=(2, 4), window_size=4, out_indices=(0, 1)))
    x = jnp.zeros((1, 32, 32, 3))
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_swin(sd))
    assert len(info['resized']) == 4  # one table per block
    model.apply(merged, x)


# ---------------------------------------------------------------- MiT ----

def test_mit_convert():
    e = (16, 32)
    sd = {}
    for k, (c, pin, ps) in enumerate(zip(e, (3, 16), (7, 3)), start=1):
        sd[f'patch_embed{k}.proj.weight'] = _t(c, pin, ps, ps)
        sd[f'patch_embed{k}.proj.bias'] = _t(c)
        sd[f'patch_embed{k}.norm.weight'] = torch.ones(c)
        sd[f'patch_embed{k}.norm.bias'] = _t(c)
        sd[f'norm{k}.weight'] = torch.ones(c)
        sd[f'norm{k}.bias'] = _t(c)
        sr = (4, 2)[k - 1]
        p = f'block{k}.0'
        sd.update({
            f'{p}.norm1.weight': torch.ones(c), f'{p}.norm1.bias': _t(c),
            f'{p}.attn.q.weight': _t(c, c), f'{p}.attn.q.bias': _t(c),
            f'{p}.attn.kv.weight': _t(2 * c, c), f'{p}.attn.kv.bias':
                _t(2 * c),
            f'{p}.attn.proj.weight': _t(c, c), f'{p}.attn.proj.bias': _t(c),
            f'{p}.attn.sr.weight': _t(c, c, sr, sr),
            f'{p}.attn.sr.bias': _t(c),
            f'{p}.attn.norm.weight': torch.ones(c),
            f'{p}.attn.norm.bias': _t(c),
            f'{p}.norm2.weight': torch.ones(c), f'{p}.norm2.bias': _t(c),
            f'{p}.mlp.fc1.weight': _t(4 * c, c), f'{p}.mlp.fc1.bias':
                _t(4 * c),
            f'{p}.mlp.dwconv.dwconv.weight': _t(4 * c, 1, 3, 3),
            f'{p}.mlp.dwconv.dwconv.bias': _t(4 * c),
            f'{p}.mlp.fc2.weight': _t(c, 4 * c), f'{p}.mlp.fc2.bias': _t(c),
        })
    model = build_backbone(dict(
        type='MixVisionTransformer', embed_dims=16, num_stages=2,
        num_layers=(1, 1), num_heads=(1, 2), patch_sizes=(7, 3),
        strides=(4, 2), sr_ratios=(4, 2), out_indices=(0, 1)))
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_mit(sd))
    assert not info['missing'] and not info['unexpected'], info
    model.apply(merged, x)


# --------------------------------------------------------------- BEiT ----

def test_beit_convert():
    embed, layers, window = 32, 2, 4
    tbl = (2 * window - 1) ** 2 + 3
    sd = {
        'patch_embed.proj.weight': _t(embed, 3, 16, 16),
        'patch_embed.proj.bias': _t(embed),
        'cls_token': _t(1, 1, embed),
    }
    for i in range(layers):
        p = f'blocks.{i}'
        sd.update({
            f'{p}.gamma_1': _t(embed), f'{p}.gamma_2': _t(embed),
            f'{p}.norm1.weight': torch.ones(embed),
            f'{p}.norm1.bias': _t(embed),
            f'{p}.attn.qkv.weight': _t(3 * embed, embed, seed=i),
            f'{p}.attn.q_bias': _t(embed), f'{p}.attn.v_bias': _t(embed),
            f'{p}.attn.relative_position_bias_table': _t(tbl, 2),
            f'{p}.attn.relative_position_index':
                torch.zeros(17, 17).long(),
            f'{p}.attn.proj.weight': _t(embed, embed),
            f'{p}.attn.proj.bias': _t(embed),
            f'{p}.norm2.weight': torch.ones(embed),
            f'{p}.norm2.bias': _t(embed),
            f'{p}.mlp.fc1.weight': _t(4 * embed, embed),
            f'{p}.mlp.fc1.bias': _t(4 * embed),
            f'{p}.mlp.fc2.weight': _t(embed, 4 * embed),
            f'{p}.mlp.fc2.bias': _t(embed),
        })
    model = build_backbone(dict(
        type='BEiT', img_size=64, patch_size=16, embed_dims=32,
        num_layers=2, num_heads=2, out_indices=(0, 1)))
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_beit(sd))
    assert not info['missing'] and not info['unexpected'], info
    model.apply(merged, x)


# -------------------------------------------------------------- Twins ----

def test_twins_pcpvt_convert_identity_dwconv():
    e = (16, 32)
    sd = {}
    for k, (c, pin, ps) in enumerate(zip(e, (3, 16), (4, 2))):
        sd[f'patch_embeds.{k}.proj.weight'] = _t(c, pin, ps, ps)
        sd[f'patch_embeds.{k}.proj.bias'] = _t(c)
        sd[f'patch_embeds.{k}.norm.weight'] = torch.ones(c)
        sd[f'patch_embeds.{k}.norm.bias'] = _t(c)
        sd[f'pos_block.{k}.proj.0.weight'] = _t(c, 1, 3, 3)
        sd[f'pos_block.{k}.proj.0.bias'] = _t(c)
        sr = (4, 2)[k]
        p = f'blocks.{k}.0'
        sd.update({
            f'{p}.norm1.weight': torch.ones(c), f'{p}.norm1.bias': _t(c),
            f'{p}.attn.q.weight': _t(c, c), f'{p}.attn.q.bias': _t(c),
            f'{p}.attn.kv.weight': _t(2 * c, c),
            f'{p}.attn.kv.bias': _t(2 * c),
            f'{p}.attn.proj.weight': _t(c, c), f'{p}.attn.proj.bias': _t(c),
            f'{p}.attn.sr.weight': _t(c, c, sr, sr),
            f'{p}.attn.sr.bias': _t(c),
            f'{p}.attn.norm.weight': torch.ones(c),
            f'{p}.attn.norm.bias': _t(c),
            f'{p}.norm2.weight': torch.ones(c), f'{p}.norm2.bias': _t(c),
            f'{p}.mlp.fc1.weight': _t(4 * c, c),
            f'{p}.mlp.fc1.bias': _t(4 * c),
            f'{p}.mlp.fc2.weight': _t(c, 4 * c), f'{p}.mlp.fc2.bias': _t(c),
        })
    model = build_backbone(dict(
        type='PCPVT', embed_dims=(16, 32), num_heads=(1, 2),
        mlp_ratios=(4, 4), depths=(1, 1), sr_ratios=(4, 2),
        patch_sizes=(4, 2), strides=(4, 2), out_indices=(0, 1),
        qkv_bias=True))  # configs pass qkv_bias=True; ckpt carries biases
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_twins(sd))
    assert not info['missing'] and not info['unexpected'], info
    # identity dwconv fill: center tap 1, rest 0
    kern = merged['params']['block0_0']['ffn']['dwconv']['conv']['kernel']
    assert kern.shape == (3, 3, 1, 64)
    assert np.all(kern[1, 1, 0] == 1.0) and float(np.abs(kern).sum()) == 64
    model.apply(merged, x)


def test_twins_svt_convert():
    sd = {}
    for k, (c, pin, ps) in enumerate(zip((16, 32), (3, 16), (4, 2))):
        sd[f'patch_embeds.{k}.proj.weight'] = _t(c, pin, ps, ps)
        sd[f'patch_embeds.{k}.proj.bias'] = _t(c)
        sd[f'patch_embeds.{k}.norm.weight'] = torch.ones(c)
        sd[f'patch_embeds.{k}.norm.bias'] = _t(c)
        sd[f'pos_block.{k}.proj.0.weight'] = _t(c, 1, 3, 3)
        sd[f'pos_block.{k}.proj.0.bias'] = _t(c)
        sr = (4, 2)[k]
        for j in range(2):  # LSA (even) / GSA (odd) alternation
            p = f'blocks.{k}.{j}'
            sd.update({
                f'{p}.norm1.weight': torch.ones(c),
                f'{p}.norm1.bias': _t(c),
                f'{p}.attn.proj.weight': _t(c, c),
                f'{p}.attn.proj.bias': _t(c),
                f'{p}.norm2.weight': torch.ones(c),
                f'{p}.norm2.bias': _t(c),
                f'{p}.mlp.fc1.weight': _t(4 * c, c),
                f'{p}.mlp.fc1.bias': _t(4 * c),
                f'{p}.mlp.fc2.weight': _t(c, 4 * c),
                f'{p}.mlp.fc2.bias': _t(c),
            })
            if j % 2 == 0:
                sd[f'{p}.attn.qkv.weight'] = _t(3 * c, c)
                sd[f'{p}.attn.qkv.bias'] = _t(3 * c)
            else:
                sd[f'{p}.attn.q.weight'] = _t(c, c)
                sd[f'{p}.attn.q.bias'] = _t(c)
                sd[f'{p}.attn.kv.weight'] = _t(2 * c, c)
                sd[f'{p}.attn.kv.bias'] = _t(2 * c)
                sd[f'{p}.attn.sr.weight'] = _t(c, c, sr, sr)
                sd[f'{p}.attn.sr.bias'] = _t(c)
                sd[f'{p}.attn.norm.weight'] = torch.ones(c)
                sd[f'{p}.attn.norm.bias'] = _t(c)
    # stage norms (norm_after_stage=True is the reference SVT default)
    for k, c in enumerate((16, 32)):
        sd[f'norm_list.{k}.weight'] = torch.ones(c)
        sd[f'norm_list.{k}.bias'] = _t(c)
    model = build_backbone(dict(
        type='SVT', embed_dims=(16, 32), num_heads=(1, 2),
        mlp_ratios=(4, 4), depths=(2, 2), sr_ratios=(4, 2),
        patch_sizes=(4, 2), strides=(4, 2), out_indices=(0, 1),
        qkv_bias=True))
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)
    merged, info = merge_pretrained(template, convert_twins(sd))
    assert not info['missing'] and not info['unexpected'], info
    model.apply(merged, x)


# --------------------------------------------------------------- STDC ----

def test_stdc_convert():
    model = build_backbone(dict(
        type='STDCNet', stdc_type='STDCNet1', in_channels=3,
        channels=(32, 64, 256, 512, 1024), bottleneck_type='cat',
        norm_cfg=dict(type='BN'), act_cfg=dict(type='ReLU'),
        num_convs=4, with_final_conv=False))
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)
    # synthesize the official flat features.N layout from the template
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, 'items'):
                walk(v, prefix + (k,))
            else:
                flat[prefix + (k,)] = np.asarray(v)
    walk(template['params'], ())
    walk(template.get('batch_stats', {}), ())

    sd = {}
    stage_counts = {}
    for path in flat:
        if path[0].startswith('stage'):
            s, j = path[0][5:].split('_')
            stage_counts.setdefault(int(s), set()).add(int(j))
    blocks_per_stage = tuple(len(stage_counts[s])
                             for s in sorted(stage_counts))
    feat_idx = {}
    n = 2
    for s in sorted(stage_counts):
        for j in sorted(stage_counts[s]):
            feat_idx[f'stage{s}_{j}'] = n
            n += 1

    def put_convx(torch_prefix, tree_prefix):
        k = flat[tree_prefix + ('conv_m', 'conv', 'kernel')]
        sd[f'{torch_prefix}.conv.weight'] = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        c = k.shape[-1]
        sd[f'{torch_prefix}.bn.weight'] = torch.ones(c)
        sd[f'{torch_prefix}.bn.bias'] = torch.zeros(c)
        sd[f'{torch_prefix}.bn.running_mean'] = torch.zeros(c)
        sd[f'{torch_prefix}.bn.running_var'] = torch.ones(c)
        sd[f'{torch_prefix}.bn.num_batches_tracked'] = torch.tensor(0)

    put_convx('features.0', ('stem0',))
    put_convx('features.1', ('stem1',))
    for name, fi in feat_idx.items():
        ks = [p for p in flat if p[0] == name and p[1].startswith('conv')
              and p[-1] == 'kernel']
        n_convs = len({p[1] for p in ks})
        for c_i in range(n_convs):
            put_convx(f'features.{fi}.conv_list.{c_i}',
                      (name, f'conv{c_i}'))
        if any(p[1] == 'downsample' for p in flat if p[0] == name):
            put_convx(f'features.{fi}.avd_layer', (name, 'downsample'))
            # official avd_layer is [conv, bn]: rename to indexed members
            for leaf in ('conv.weight', 'bn.weight', 'bn.bias',
                         'bn.running_mean', 'bn.running_var',
                         'bn.num_batches_tracked'):
                src = f'features.{fi}.avd_layer.{leaf}'
                idx = '0.weight' if leaf == 'conv.weight' else \
                    '1.' + leaf.split('.', 1)[1]
                sd[f'features.{fi}.avd_layer.{idx}'] = sd.pop(src)
    converted = convert_stdc(sd, blocks_per_stage=blocks_per_stage)
    merged, info = merge_pretrained(template, converted)
    assert not info['missing'] and not info['unexpected'], \
        (info['missing'][:5], info['unexpected'][:5])
    model.apply(merged, x, train=False)


def test_stdc_convert_add_skip():
    """'add' bottleneck: the official AddBottleneck skip is a 4-element
    Sequential (dw-conv, BN, 1x1, BN) → our skip0/skip1 ConvModules."""
    model = build_backbone(dict(
        type='STDCNet', stdc_type='STDCNet1', in_channels=3,
        channels=(8, 16, 32, 64, 128), bottleneck_type='add',
        norm_cfg=dict(type='BN'), act_cfg=dict(type='ReLU'),
        num_convs=4, with_final_conv=False))
    x = jnp.zeros((1, 64, 64, 3))
    template = _init(model, x)

    def walk(tree, prefix, flat):
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, 'items'):
                walk(v, prefix + (k,), flat)
            else:
                flat[prefix + (k,)] = np.asarray(v)
        return flat
    flat = walk(template['params'], (), {})
    walk(template.get('batch_stats', {}), (), flat)

    sd = {}
    feat_idx = {'stem0': 0, 'stem1': 1, 'stage0_0': 2, 'stage0_1': 3,
                'stage1_0': 4, 'stage1_1': 5, 'stage2_0': 6, 'stage2_1': 7}

    def put(torch_key, path):
        arr = flat[path]
        if path[-1] == 'kernel':
            arr = arr.transpose(3, 2, 0, 1)
        sd[torch_key] = torch.from_numpy(np.ascontiguousarray(arr))

    for path in flat:
        block, fi = path[0], feat_idx[path[0]]
        leaf = {'kernel': 'weight', 'scale': 'weight', 'bias': 'bias',
                'mean': 'running_mean', 'var': 'running_var'}[path[-1]]
        if block.startswith('stem'):
            member = 'conv' if path[1] == 'conv_m' else 'bn'
            put(f'features.{fi}.{member}.{leaf}', path)
        elif path[1].startswith('conv'):
            member = 'conv' if path[2] == 'conv_m' else 'bn'
            put(f'features.{fi}.conv_list.{path[1][4:]}.{member}.{leaf}',
                path)
        elif path[1] == 'downsample':
            idx = '0' if path[2] == 'conv_m' else '1'
            put(f'features.{fi}.avd_layer.{idx}.{leaf}', path)
        elif path[1] in ('skip0', 'skip1'):
            base = 0 if path[1] == 'skip0' else 2
            idx = base if path[2] == 'conv_m' else base + 1
            put(f'cp.features.{fi}.skip.{idx}.{leaf}', path)  # cp. stripped
    converted = convert_stdc(sd, blocks_per_stage=(2, 2, 2))
    merged, info = merge_pretrained(template, converted)
    assert not info['missing'] and not info['unexpected'], \
        (info['missing'][:5], info['unexpected'][:5])
    # value round-trip: merged tree must equal the template it came from
    mflat = walk(merged['params'], (), {})
    walk(merged.get('batch_stats', {}), (), mflat)
    for path, v in flat.items():
        np.testing.assert_array_equal(mflat[path], v)


# ------------------------------------------------- config-path loading ----

def test_backbone_pretrained_field_loads_ckpt(tmp_path):
    """backbone.pretrained=<converted .ckpt> must overlay weights at
    init_weights (≙ mmcv Pretrained init_cfg flow)."""
    from stc_unet_tpu.engine.checkpoint import save_checkpoint
    from stc_unet_tpu.models import build_segmentor

    sd = _vit_sd()
    converted = convert_vit(sd)
    ckpt = str(tmp_path / 'vit.ckpt')
    save_checkpoint(ckpt, {col: {'backbone': t}
                           for col, t in converted.items()})
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=64, patch_size=16,
                      embed_dims=32, num_layers=2, num_heads=2,
                      out_indices=(1,), final_norm=True, pretrained=ckpt),
        decode_head=dict(type='FCNHead', in_channels=32, channels=16,
                         num_classes=4, num_convs=1),
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(64, 64))
    got = np.asarray(
        model.variables['params']['backbone']['cls_token'])
    want = sd['cls_token'].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and a deep leaf
    got_qkv = np.asarray(model.variables['params']['backbone']
                         ['layers_1']['attn']['qkv']['kernel'])
    np.testing.assert_allclose(
        got_qkv, sd['blocks.1.attn.qkv.weight'].numpy().T, rtol=1e-6)


def test_backbone_pretrained_remote_spec_skipped():
    import warnings
    from stc_unet_tpu.models import build_segmentor
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, pretrained='open-mmlab://x'),
        decode_head=dict(type='FCNHead', in_channels=512, channels=16,
                         num_classes=4, num_convs=1),
        test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        model.init_weights(seed=0, input_size=(32, 32))
    assert any('remote spec' in str(x.message) for x in w)


# ----------------------- transformer backbone numerical oracles (r5) ----

def _beit_rel_index(window):
    import numpy as _np
    coords = _np.stack(_np.meshgrid(_np.arange(window), _np.arange(window),
                                    indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(_np.int64)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    num = window * window
    m = (2 * window - 1) ** 2
    idx = _np.zeros((num + 1, num + 1), _np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = m
    idx[0:, 0] = m + 1
    idx[0, 0] = m + 2
    return torch.from_numpy(idx)


def _torch_beit_forward(sd, x_nchw, embed=32, layers=2, heads=2, patch=16,
                        window=4, full_bias=False, eps=1e-6):
    """mmseg BEiT/MAE forward (reference beit.py / mae.py) in plain torch."""
    import torch.nn.functional as F
    x = F.conv2d(x_nchw, sd['patch_embed.proj.weight'],
                 sd['patch_embed.proj.bias'], stride=patch)
    b, c, h, w = x.shape
    x = x.flatten(2).transpose(1, 2)
    cls = sd['cls_token'].expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1)
    if 'pos_embed' in sd:
        x = x + sd['pos_embed']
    hd = embed // heads
    idx = _beit_rel_index(window)
    outs = []
    for i in range(layers):
        p = f'blocks.{i}'
        y = F.layer_norm(x, (embed,), sd[f'{p}.norm1.weight'],
                         sd[f'{p}.norm1.bias'], eps=eps)
        if full_bias:
            bias = sd[f'{p}.attn.qkv.bias']
        else:
            bias = torch.cat([sd[f'{p}.attn.q_bias'],
                              torch.zeros(embed),
                              sd[f'{p}.attn.v_bias']])
        qkv = F.linear(y, sd[f'{p}.attn.qkv.weight'], bias)
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        tbl = sd[f'{p}.attn.relative_position_bias_table']
        rel = tbl[idx.view(-1)].view(n, n, heads).permute(2, 0, 1)
        attn = attn + rel.unsqueeze(0)
        attn = attn.softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, embed)
        y = F.linear(y, sd[f'{p}.attn.proj.weight'],
                     sd[f'{p}.attn.proj.bias'])
        x = x + sd[f'{p}.gamma_1'] * y
        y = F.layer_norm(x, (embed,), sd[f'{p}.norm2.weight'],
                         sd[f'{p}.norm2.bias'], eps=eps)
        y = F.gelu(F.linear(y, sd[f'{p}.mlp.fc1.weight'],
                            sd[f'{p}.mlp.fc1.bias']))
        y = F.linear(y, sd[f'{p}.mlp.fc2.weight'], sd[f'{p}.mlp.fc2.bias'])
        x = x + sd[f'{p}.gamma_2'] * y
        outs.append(x[:, 1:].reshape(b, h, w, embed))
    return outs


def _beit_like_sd(embed=32, layers=2, window=4, full_bias=False,
                  pos_embed=False):
    tbl = (2 * window - 1) ** 2 + 3
    sd = {
        'patch_embed.proj.weight': _t(embed, 3, 16, 16),
        'patch_embed.proj.bias': _t(embed),
        'cls_token': _t(1, 1, embed),
    }
    if pos_embed:
        sd['pos_embed'] = _t(1, window * window + 1, embed)
    for i in range(layers):
        p = f'blocks.{i}'
        sd.update({
            f'{p}.gamma_1': _t(embed, seed=i), f'{p}.gamma_2': _t(embed),
            f'{p}.norm1.weight': torch.ones(embed) + _t(embed, seed=i),
            f'{p}.norm1.bias': _t(embed),
            f'{p}.attn.qkv.weight': _t(3 * embed, embed, seed=i),
            f'{p}.attn.relative_position_bias_table': _t(tbl, 2, seed=i),
            f'{p}.attn.proj.weight': _t(embed, embed, seed=i + 3),
            f'{p}.attn.proj.bias': _t(embed),
            f'{p}.norm2.weight': torch.ones(embed) + _t(embed, seed=i + 1),
            f'{p}.norm2.bias': _t(embed),
            f'{p}.mlp.fc1.weight': _t(4 * embed, embed, seed=i),
            f'{p}.mlp.fc1.bias': _t(4 * embed),
            f'{p}.mlp.fc2.weight': _t(embed, 4 * embed, seed=i),
            f'{p}.mlp.fc2.bias': _t(embed),
        })
        if full_bias:
            sd[f'{p}.attn.qkv.bias'] = _t(3 * embed, seed=i)
        else:
            sd[f'{p}.attn.q_bias'] = _t(embed, seed=i)
            sd[f'{p}.attn.v_bias'] = _t(embed, seed=i + 9)
    return sd


def test_beit_convert_numerical_parity():
    """BEiT full-forward oracle (VERDICT r4 #3): gamma layer-scales,
    decomposed q/v bias, rel-pos table with cls rows (ref beit.py:559)."""
    sd = _beit_like_sd()
    model = build_backbone(dict(
        type='BEiT', img_size=64, patch_size=16, embed_dims=32,
        num_layers=2, num_heads=2, out_indices=(0, 1)))
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_beit(sd))
    assert not info['missing'] and not info['unexpected'], info
    outs = model.apply(merged, jnp.asarray(x))
    refs = _torch_beit_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for g, e in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_mae_convert_numerical_parity():
    """MAE full-forward oracle: BEiT blocks + ABSOLUTE pos-embed after the
    cls concat + full qkv bias (ref mae.py:128,145,237-261)."""
    sd = _beit_like_sd(full_bias=True, pos_embed=True)
    model = build_backbone(dict(
        type='MAE', img_size=64, patch_size=16, embed_dims=32,
        num_layers=2, num_heads=2, out_indices=(0, 1)))
    x = np.random.RandomState(4).rand(2, 64, 64, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_beit(sd))
    assert not info['missing'] and not info['unexpected'], info
    outs = model.apply(merged, jnp.asarray(x))
    refs = _torch_beit_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                               full_bias=True)
    for g, e in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   rtol=2e-4, atol=2e-5)


def _torch_gsa(x, sd, p, heads, sr, hw, eps=1e-5):
    """EfficientMultiheadAttention / GSA (ref mit.py + twins.py:21-76)."""
    import torch.nn.functional as F
    b, n, c = x.shape
    h, w = hw
    hd = c // heads
    q = F.linear(x, sd[f'{p}.q.weight'], sd.get(f'{p}.q.bias'))
    kv_in = x
    if sr > 1:
        xr = x.transpose(1, 2).reshape(b, c, h, w)
        xr = F.conv2d(xr, sd[f'{p}.sr.weight'], sd[f'{p}.sr.bias'],
                      stride=sr)
        kv_in = xr.reshape(b, c, -1).transpose(1, 2)
        kv_in = F.layer_norm(kv_in, (c,), sd[f'{p}.norm.weight'],
                             sd[f'{p}.norm.bias'], eps=eps)
    kv = F.linear(kv_in, sd[f'{p}.kv.weight'], sd.get(f'{p}.kv.bias'))
    m = kv_in.shape[1]
    k, v = kv[..., :c], kv[..., c:]
    q = q.reshape(b, n, heads, hd).permute(0, 2, 1, 3)
    k = k.reshape(b, m, heads, hd).permute(0, 2, 1, 3)
    v = v.reshape(b, m, heads, hd).permute(0, 2, 1, 3)
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    attn = attn.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, c)
    return F.linear(out, sd[f'{p}.proj.weight'], sd[f'{p}.proj.bias'])


def _torch_lsa(x, sd, p, heads, ws, hw):
    """LocallyGroupedSelfAttention with the reference pad mask
    (twins.py:148-244, incl. the [-0:] all-ones quirk)."""
    import torch.nn.functional as F
    b, n, c = x.shape
    h, w = hw
    hd = c // heads
    feat = x.view(b, h, w, c)
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    feat = F.pad(feat, (0, 0, 0, pad_r, 0, pad_b))
    hp, wp = h + pad_b, w + pad_r
    _h, _w = hp // ws, wp // ws
    mask = torch.zeros(1, hp, wp)
    mask[:, hp - pad_b:, :] = 1   # [-0:] quirk: pad_b==0 → fills ALL rows
    if pad_b == 0:
        mask[:, :, :] = 1
    mask[:, :, wp - pad_r:] = 1
    if pad_r == 0:
        mask[:, :, :] = 1
    mw = mask.reshape(1, _h, ws, _w, ws).transpose(2, 3).reshape(
        1, _h * _w, ws * ws)
    am = mw.unsqueeze(2) - mw.unsqueeze(3)
    am = am.masked_fill(am != 0, -1000.0)
    feat = feat.reshape(b, _h, ws, _w, ws, c).transpose(2, 3)
    qkv = F.linear(feat, sd[f'{p}.qkv.weight'], sd.get(f'{p}.qkv.bias'))
    qkv = qkv.reshape(b, _h * _w, ws * ws, 3, heads, hd).permute(
        3, 0, 1, 4, 2, 5)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    attn = attn + am.unsqueeze(2)
    attn = attn.softmax(-1)
    out = (attn @ v).transpose(2, 3).reshape(b, _h, _w, ws, ws, c)
    out = out.transpose(2, 3).reshape(b, hp, wp, c)
    if pad_r > 0 or pad_b > 0:
        out = out[:, :h, :w, :]
    out = out.reshape(b, n, c)
    return F.linear(out, sd[f'{p}.proj.weight'], sd[f'{p}.proj.bias'])


def _torch_twins_forward(sd, x_nchw, embeds, depths, heads, srs, patches,
                         svt=False, window=7, norm_after_stage=False):
    import torch.nn.functional as F
    x = x_nchw
    outs = []
    for i in range(len(depths)):
        c, s = embeds[i], patches[i]
        ph = (s - x.shape[2] % s) % s
        pw = (s - x.shape[3] % s) % s
        if ph or pw:
            x = F.pad(x, (0, pw, 0, ph))   # corner AdaptivePadding
        x = F.conv2d(x, sd[f'patch_embeds.{i}.proj.weight'],
                     sd[f'patch_embeds.{i}.proj.bias'], stride=s)
        b, _, h, w = x.shape
        tok = x.flatten(2).transpose(1, 2)
        tok = F.layer_norm(tok, (c,), sd[f'patch_embeds.{i}.norm.weight'],
                           sd[f'patch_embeds.{i}.norm.bias'], eps=1e-5)
        for j in range(depths[i]):
            p = f'blocks.{i}.{j}'
            y = F.layer_norm(tok, (c,), sd[f'{p}.norm1.weight'],
                             sd[f'{p}.norm1.bias'], eps=1e-5)
            if svt and j % 2 == 0:
                y = _torch_lsa(y, sd, f'{p}.attn', heads[i], window, (h, w))
            else:
                y = _torch_gsa(y, sd, f'{p}.attn', heads[i], srs[i], (h, w))
            tok = tok + y
            y = F.layer_norm(tok, (c,), sd[f'{p}.norm2.weight'],
                             sd[f'{p}.norm2.bias'], eps=1e-5)
            y = F.gelu(F.linear(y, sd[f'{p}.mlp.fc1.weight'],
                                sd[f'{p}.mlp.fc1.bias']))
            y = F.linear(y, sd[f'{p}.mlp.fc2.weight'],
                         sd[f'{p}.mlp.fc2.bias'])
            tok = tok + y
            if j == 0:   # PEG (CPE, stride 1: proj(x) + x)
                f2 = tok.transpose(1, 2).reshape(b, c, h, w)
                f2 = F.conv2d(f2, sd[f'pos_block.{i}.proj.0.weight'],
                              sd[f'pos_block.{i}.proj.0.bias'],
                              padding=1, groups=c)
                tok = tok + f2.flatten(2).transpose(1, 2)
        if norm_after_stage:
            tok = F.layer_norm(tok, (c,), sd[f'norm_list.{i}.weight'],
                               sd[f'norm_list.{i}.bias'], eps=1e-5)
        x = tok.transpose(1, 2).reshape(b, c, h, w)
        outs.append(x.permute(0, 2, 3, 1))
    return outs


def _twins_sd(embeds, depths, srs, patches, svt=False, window=7,
              norm_after_stage=False, qkv_bias=True):
    sd = {}
    pin = 3
    for i, (c, d, s) in enumerate(zip(embeds, depths, patches)):
        sd[f'patch_embeds.{i}.proj.weight'] = _t(c, pin, s, s, seed=i)
        sd[f'patch_embeds.{i}.proj.bias'] = _t(c)
        sd[f'patch_embeds.{i}.norm.weight'] = torch.ones(c) + _t(c, seed=i)
        sd[f'patch_embeds.{i}.norm.bias'] = _t(c)
        sd[f'pos_block.{i}.proj.0.weight'] = _t(c, 1, 3, 3, seed=i)
        sd[f'pos_block.{i}.proj.0.bias'] = _t(c)
        if norm_after_stage:
            sd[f'norm_list.{i}.weight'] = torch.ones(c) + _t(c, seed=i + 2)
            sd[f'norm_list.{i}.bias'] = _t(c)
        for j in range(d):
            p = f'blocks.{i}.{j}'
            sd.update({
                f'{p}.norm1.weight': torch.ones(c) + _t(c, seed=i + j),
                f'{p}.norm1.bias': _t(c),
                f'{p}.attn.proj.weight': _t(c, c, seed=i + j),
                f'{p}.attn.proj.bias': _t(c),
                f'{p}.norm2.weight': torch.ones(c) + _t(c, seed=j),
                f'{p}.norm2.bias': _t(c),
                f'{p}.mlp.fc1.weight': _t(4 * c, c, seed=i + j),
                f'{p}.mlp.fc1.bias': _t(4 * c),
                f'{p}.mlp.fc2.weight': _t(c, 4 * c, seed=i + j),
                f'{p}.mlp.fc2.bias': _t(c),
            })
            if svt and j % 2 == 0:
                sd[f'{p}.attn.qkv.weight'] = _t(3 * c, c, seed=i * 5 + j)
                if qkv_bias:
                    sd[f'{p}.attn.qkv.bias'] = _t(3 * c)
            else:
                sd[f'{p}.attn.q.weight'] = _t(c, c, seed=i * 5 + j)
                sd[f'{p}.attn.kv.weight'] = _t(2 * c, c, seed=i * 5 + j)
                if qkv_bias:
                    sd[f'{p}.attn.q.bias'] = _t(c)
                    sd[f'{p}.attn.kv.bias'] = _t(2 * c)
                sr = srs[i]
                if sr > 1:
                    sd[f'{p}.attn.sr.weight'] = _t(c, c, sr, sr, seed=i)
                    sd[f'{p}.attn.sr.bias'] = _t(c)
                    sd[f'{p}.attn.norm.weight'] = torch.ones(c) + \
                        _t(c, seed=i)
                    sd[f'{p}.attn.norm.bias'] = _t(c)
        pin = c
    return sd


def test_twins_pcpvt_numerical_parity():
    """PCPVT full-forward oracle: GSA + PEG-after-first-block + corner
    patch padding at a non-divisible geometry (ref twins.py:353-510)."""
    embeds, depths, srs, patches = (16, 32), (2, 2), (4, 2), (4, 2)
    sd = _twins_sd(embeds, depths, srs, patches)
    model = build_backbone(dict(
        type='PCPVT', embed_dims=embeds, num_heads=(1, 2),
        mlp_ratios=(4, 4), depths=depths, sr_ratios=srs,
        patch_sizes=patches, strides=patches, out_indices=(0, 1),
        qkv_bias=True))
    x = np.random.RandomState(5).rand(2, 66, 66, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_twins(sd))
    assert not info['missing'] and not info['unexpected'], info
    outs = model.apply(merged, jnp.asarray(x))
    refs = _torch_twins_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                embeds, depths, (1, 2), srs, patches)
    for g, e in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_twins_svt_numerical_parity():
    """SVT full-forward oracle: LSA pad mask (both-pads case, 16x16 tokens
    at window 7 → 5/5 pads), GSA alternation, stage norms
    (ref twins.py:148-244,512-588)."""
    embeds, depths, srs, patches = (16, 32), (2, 2), (4, 2), (4, 2)
    sd = _twins_sd(embeds, depths, srs, patches, svt=True, window=7,
                   norm_after_stage=True)
    model = build_backbone(dict(
        type='SVT', embed_dims=embeds, num_heads=(1, 2),
        mlp_ratios=(4, 4), depths=depths, sr_ratios=srs,
        patch_sizes=patches, strides=patches, out_indices=(0, 1),
        windiow_sizes=(7, 7), qkv_bias=True))
    x = np.random.RandomState(6).rand(2, 64, 64, 3).astype(np.float32)
    template = _init(model, jnp.asarray(x))
    merged, info = merge_pretrained(template, convert_twins(sd))
    assert not info['missing'] and not info['unexpected'], info
    outs = model.apply(merged, jnp.asarray(x))
    refs = _torch_twins_forward(sd, torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                embeds, depths, (1, 2), srs, patches,
                                svt=True, window=7, norm_after_stage=True)
    for g, e in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(g), e.numpy(),
                                   rtol=2e-4, atol=2e-5)
