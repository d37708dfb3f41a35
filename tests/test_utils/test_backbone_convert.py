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
        patch_sizes=(4, 2), strides=(4, 2), out_indices=(0, 1)))
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
    model = build_backbone(dict(
        type='SVT', embed_dims=(16, 32), num_heads=(1, 2),
        mlp_ratios=(4, 4), depths=(2, 2), sr_ratios=(4, 2),
        patch_sizes=(4, 2), strides=(4, 2), out_indices=(0, 1)))
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
