"""Official pretrained-checkpoint → flax converters for the backbone zoo.

≙ the reference's ``tools/model_converters/{vit,swin,beit,mit,twins,stdc}
2mmseg.py`` scripts: they rename official-release torch ``state_dict`` keys
into the framework's module tree. Here the target tree is this framework's
flax variables (NHWC / HWIO layouts), so on top of the renames every conv
kernel is transposed OIHW→HWIO and every linear weight (out,in)→(in,out);
BN stats are routed into the ``batch_stats`` collection.

Mismatched-geometry leaves (``pos_embed``, ``relative_position_bias_table``)
are bilinearly resized at merge time — the standard recipe for fine-tuning a
224² classification checkpoint at segmentation resolutions.

Usage::

    sd = torch.load('swin_tiny_patch4_window7_224.pth')['model']
    converted = convert_swin(sd)
    variables, info = merge_pretrained(model_variables, converted)
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    'convert_vit', 'convert_swin', 'convert_mit', 'convert_beit',
    'convert_twins', 'convert_stdc', 'merge_pretrained', 'CONVERTERS',
]


# --------------------------------------------------------------------------
# low-level helpers
# --------------------------------------------------------------------------

def _np(v) -> np.ndarray:
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _conv_w(v) -> np.ndarray:
    """torch conv weight OIHW → flax HWIO (depthwise (C,1,k,k)→(k,k,1,C))."""
    return np.transpose(_np(v), (2, 3, 1, 0))


def _lin_w(v) -> np.ndarray:
    return np.transpose(_np(v), (1, 0))


def _insert(tree: dict, path: str, value: np.ndarray):
    keys = path.split('/')
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


class _Out:
    """Accumulates params + batch_stats trees."""

    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}

    def p(self, path, value):
        _insert(self.params, path, value)

    def ln(self, prefix, key, value):
        """LayerNorm/BN affine: torch weight/bias → flax scale/bias."""
        leaf = 'scale' if key == 'weight' else 'bias'
        _insert(self.params, f'{prefix}/{leaf}', _np(value))

    def bn_stat(self, prefix, key, value):
        leaf = 'mean' if key == 'running_mean' else 'var'
        _insert(self.batch_stats, f'{prefix}/{leaf}', _np(value))

    def variables(self):
        out = {'params': self.params}
        if self.batch_stats:
            out['batch_stats'] = self.batch_stats
        return out


def _strip_prefixes(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap nested dicts and drop common wrappers (module./backbone.)."""
    for key in ('state_dict', 'model', 'module'):
        if key in state_dict and isinstance(state_dict[key], dict):
            state_dict = state_dict[key]
    out = {}
    for k, v in state_dict.items():
        for pre in ('module.', 'backbone.'):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _identity_dwconv(kernel_size: int, channels: int) -> np.ndarray:
    """Depthwise 3×3 identity kernel (HWIO (k,k,1,C)): makes a MixFFN
    numerically equal to the plain 2-layer MLP of checkpoints that lack a
    depthwise conv (official Twins-PCPVT)."""
    k = np.zeros((kernel_size, kernel_size, 1, channels), np.float32)
    k[kernel_size // 2, kernel_size // 2, 0, :] = 1.0
    return k


# --------------------------------------------------------------------------
# ViT (timm / DeiT layout — ≙ reference vit2mmseg.py)
# --------------------------------------------------------------------------

def convert_vit(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """timm/DeiT ViT: ``blocks.N.{norm1,attn.{qkv,proj},norm2,mlp.fc*}``."""
    sd = _strip_prefixes(state_dict)
    out = _Out()
    for key, v in sd.items():
        if key.startswith(('head', 'pre_logits')) or key.endswith(
                'attn_mask') or 'relative_position_index' in key:
            continue
        if key == 'patch_embed.proj.weight':
            out.p('patch_embed/kernel', _conv_w(v))
        elif key == 'patch_embed.proj.bias':
            out.p('patch_embed/bias', _np(v))
        elif key in ('pos_embed', 'cls_token'):
            out.p(key, _np(v))
        elif key in ('norm.weight', 'norm.bias', 'fc_norm.weight',
                     'fc_norm.bias'):
            out.ln('norm1_final', key.split('.')[-1], v)
        else:
            m = re.fullmatch(r'blocks\.(\d+)\.(.+)', key)
            if m is None:
                continue  # tolerated extras (dist_token, mask_token, …)
            base = f'layers_{m.group(1)}'
            rest = m.group(2)
            _vit_block(out, base, rest, v)
    return out.variables()


def _vit_block(out: _Out, base: str, rest: str, v):
    if rest.startswith(('norm1.', 'norm2.')):
        name, leaf = rest.split('.')
        out.ln(f'{base}/{name}', leaf, v)
    elif rest == 'attn.qkv.weight':
        out.p(f'{base}/attn/qkv/kernel', _lin_w(v))
    elif rest == 'attn.qkv.bias':
        out.p(f'{base}/attn/qkv/bias', _np(v))
    elif rest == 'attn.proj.weight':
        out.p(f'{base}/attn/proj/kernel', _lin_w(v))
    elif rest == 'attn.proj.bias':
        out.p(f'{base}/attn/proj/bias', _np(v))
    elif rest.startswith('mlp.fc'):
        _, fc, leaf = rest.split('.')
        if leaf == 'weight':
            out.p(f'{base}/{fc}/kernel', _lin_w(v))
        else:
            out.p(f'{base}/{fc}/bias', _np(v))


# --------------------------------------------------------------------------
# Swin (official Microsoft layout — ≙ reference swin2mmseg.py)
# --------------------------------------------------------------------------

def convert_swin(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Official Swin: ``layers.I.blocks.J.*`` → ``stages_I/blocks_J/*``.

    Our PatchMerging concatenates the 2×2 window in the official order
    (x00, x10, x01, x11 — see ``models/utils/swin_core.py:220-224``), so
    ``downsample.reduction`` transfers with a plain transpose.
    """
    sd = _strip_prefixes(state_dict)
    out = _Out()
    max_stage = -1
    for key in sd:
        m = re.match(r'layers\.(\d+)\.', key)
        if m:
            max_stage = max(max_stage, int(m.group(1)))
    for key, v in sd.items():
        if key.startswith('head') or 'relative_position_index' in key \
                or key.endswith('attn_mask'):
            continue
        if key == 'patch_embed.proj.weight':
            out.p('patch_embed/proj/kernel', _conv_w(v))
        elif key == 'patch_embed.proj.bias':
            out.p('patch_embed/proj/bias', _np(v))
        elif key.startswith('patch_embed.norm.'):
            out.ln('patch_embed/norm', key.split('.')[-1], v)
        elif key in ('norm.weight', 'norm.bias'):
            # classification ckpts carry only the final-stage norm
            out.ln(f'norm{max_stage}', key.split('.')[-1], v)
        elif re.match(r'norm(\d+)\.', key):  # mmseg-style per-stage norms
            name, leaf = key.split('.')
            out.ln(name, leaf, v)
        else:
            m = re.fullmatch(r'layers\.(\d+)\.(.+)', key)
            if m is None:
                continue
            stage, rest = f'stages_{m.group(1)}', m.group(2)
            bm = re.fullmatch(r'blocks\.(\d+)\.(.+)', rest)
            if bm is not None:
                base = f'{stage}/blocks_{bm.group(1)}'
                r = bm.group(2)
                if r == 'attn.relative_position_bias_table':
                    out.p(f'{base}/attn/relative_position_bias_table',
                          _np(v))
                elif r.startswith('attn.'):
                    _vit_block(out, base, r, v)
                elif r.startswith(('norm1.', 'norm2.')):
                    _vit_block(out, base, r, v)
                elif r.startswith('mlp.fc'):
                    _, fc, leaf = r.split('.')
                    tgt = f'{base}/mlp/{fc}'
                    if leaf == 'weight':
                        out.p(f'{tgt}/kernel', _lin_w(v))
                    else:
                        out.p(f'{tgt}/bias', _np(v))
            elif rest == 'downsample.reduction.weight':
                out.p(f'{stage}/downsample/reduction/kernel', _lin_w(v))
            elif rest.startswith('downsample.norm.'):
                out.ln(f'{stage}/downsample/norm', rest.split('.')[-1], v)
    return out.variables()


# --------------------------------------------------------------------------
# MiT / SegFormer (official NVlabs layout — ≙ reference mit2mmseg.py)
# --------------------------------------------------------------------------

def convert_mit(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Official MiT: 1-based ``patch_embed{K}/block{K}/norm{K}`` groups."""
    sd = _strip_prefixes(state_dict)
    out = _Out()
    for key, v in sd.items():
        if key.startswith('head'):
            continue
        m = re.fullmatch(r'patch_embed(\d+)\.(proj|norm)\.(weight|bias)',
                         key)
        if m:
            k = int(m.group(1)) - 1
            if m.group(2) == 'proj':
                if m.group(3) == 'weight':
                    out.p(f'patch_embed{k}_proj/conv/kernel', _conv_w(v))
                else:
                    out.p(f'patch_embed{k}_proj/conv/bias', _np(v))
            else:
                out.ln(f'patch_embed{k}_norm', m.group(3), v)
            continue
        m = re.fullmatch(r'norm(\d+)\.(weight|bias)', key)
        if m:
            out.ln(f'norm{int(m.group(1)) - 1}', m.group(2), v)
            continue
        m = re.fullmatch(r'block(\d+)\.(\d+)\.(.+)', key)
        if m is None:
            continue
        base = f'block{int(m.group(1)) - 1}_{m.group(2)}'
        _mit_block(out, base, m.group(3), v, ffn_prefix='ffn/')
    return out.variables()


def _mit_block(out: _Out, base: str, rest: str, v, ffn_prefix: str = 'ffn/'):
    """Shared MiT/Twins-GSA block member translation."""
    if rest.startswith(('norm1.', 'norm2.')):
        name, leaf = rest.split('.')
        out.ln(f'{base}/{name}', leaf, v)
    elif re.fullmatch(r'attn\.(q|kv|proj)\.(weight|bias)', rest):
        _, mod, leaf = rest.replace('.', ' ').split()
        if leaf == 'weight':
            out.p(f'{base}/attn/{mod}/kernel', _lin_w(v))
        else:
            out.p(f'{base}/attn/{mod}/bias', _np(v))
    elif rest == 'attn.qkv.weight':  # Twins-SVT LSA blocks
        out.p(f'{base}/attn/qkv/kernel', _lin_w(v))
    elif rest == 'attn.qkv.bias':
        out.p(f'{base}/attn/qkv/bias', _np(v))
    elif rest == 'attn.sr.weight':
        out.p(f'{base}/attn/sr/conv/kernel', _conv_w(v))
    elif rest == 'attn.sr.bias':
        out.p(f'{base}/attn/sr/conv/bias', _np(v))
    elif rest.startswith('attn.norm.'):
        out.ln(f'{base}/attn/sr_norm', rest.split('.')[-1], v)
    elif rest.startswith('mlp.dwconv.'):
        leaf = rest.split('.')[-1]
        if leaf == 'weight':
            out.p(f'{base}/{ffn_prefix}dwconv/conv/kernel', _conv_w(v))
        else:
            out.p(f'{base}/{ffn_prefix}dwconv/conv/bias', _np(v))
    elif rest.startswith('mlp.fc'):
        _, fc, leaf = rest.split('.')
        if leaf == 'weight':
            out.p(f'{base}/{ffn_prefix}{fc}/kernel', _lin_w(v))
        else:
            out.p(f'{base}/{ffn_prefix}{fc}/bias', _np(v))


# --------------------------------------------------------------------------
# BEiT (official unilm layout — ≙ reference beit2mmseg.py)
# --------------------------------------------------------------------------

def convert_beit(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Official BEiT: decomposed qkv bias (q_bias/v_bias), per-block
    gamma_1/gamma_2 layer-scale, relative-position bias tables."""
    sd = _strip_prefixes(state_dict)
    out = _Out()
    shared_table = None
    n_layers = 0
    for key, v in sd.items():
        m = re.match(r'blocks\.(\d+)\.', key)
        if m:
            n_layers = max(n_layers, int(m.group(1)) + 1)
        if key == 'rel_pos_bias.relative_position_bias_table':
            shared_table = _np(v)
    for key, v in sd.items():
        if key.startswith(('head', 'rel_pos_bias', 'mask_token')) or \
                'relative_position_index' in key:
            continue
        if key == 'patch_embed.proj.weight':
            out.p('patch_embed/kernel', _conv_w(v))
        elif key == 'patch_embed.proj.bias':
            out.p('patch_embed/bias', _np(v))
        elif key == 'cls_token':
            out.p('cls_token', _np(v))
        elif key == 'pos_embed':   # MAE: absolute pos-embed (mae.py:128)
            out.p('pos_embed', _np(v))
        else:
            m = re.fullmatch(r'blocks\.(\d+)\.(.+)', key)
            if m is None:
                continue
            base = f'layers_{m.group(1)}'
            rest = m.group(2)
            if rest in ('gamma_1', 'gamma_2'):
                out.p(f'{base}/{rest}', _np(v))
            elif rest == 'attn.qkv.weight':
                out.p(f'{base}/attn/qkv/kernel', _lin_w(v))
            elif rest == 'attn.qkv.bias':   # MAE: full qkv bias
                out.p(f'{base}/attn/qkv/bias', _np(v))
            elif rest in ('attn.q_bias', 'attn.v_bias'):
                out.p(f'{base}/attn/{rest.split(".")[-1]}', _np(v))
            elif rest == 'attn.relative_position_bias_table':
                out.p(f'{base}/attn/relative_position_bias_table', _np(v))
            else:
                _vit_block(out, base, rest, v)
    if shared_table is not None:
        # pretrain ckpts share one table across blocks — replicate it
        for i in range(n_layers):
            path = f'layers_{i}/attn/relative_position_bias_table'
            node = out.params.get(f'layers_{i}', {}).get('attn', {})
            if 'relative_position_bias_table' not in node:
                out.p(path, shared_table.copy())
    return out.variables()


# --------------------------------------------------------------------------
# Twins (official Meituan GVT layout — ≙ reference twins2mmseg.py)
# --------------------------------------------------------------------------

def convert_twins(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Official Twins (PCPVT & SVT share key names; SVT is auto-detected by
    its ``attn.qkv`` LSA blocks).

    Official Twins FFNs are plain 2-layer MLPs; our PCPVT reuses the MiT
    block whose MixFFN has a depthwise conv between fc1 and the activation.
    The converter fills that conv with an identity kernel, which makes the
    MixFFN numerically identical to the checkpoint's MLP.
    """
    sd = _strip_prefixes(state_dict)
    is_svt = any(re.search(r'blocks\.\d+\.\d+\.attn\.qkv\.', k) for k in sd)
    out = _Out()
    fc1_dims: Dict[str, int] = {}
    for key, v in sd.items():
        if key.startswith('head') or key in ('norm.weight', 'norm.bias'):
            continue
        m = re.fullmatch(
            r'patch_embeds\.(\d+)\.(proj|norm)\.(weight|bias)', key)
        if m:
            k = m.group(1)
            if m.group(2) == 'proj':
                if m.group(3) == 'weight':
                    out.p(f'patch_embed{k}_proj/conv/kernel', _conv_w(v))
                else:
                    out.p(f'patch_embed{k}_proj/conv/bias', _np(v))
            else:
                out.ln(f'patch_embed{k}_norm', m.group(3), v)
            continue
        m = re.fullmatch(r'pos_block\.(\d+)\.proj\.0\.(weight|bias)', key)
        if m:
            if m.group(2) == 'weight':
                out.p(f'peg{m.group(1)}/proj/conv/kernel', _conv_w(v))
            else:
                out.p(f'peg{m.group(1)}/proj/conv/bias', _np(v))
            continue
        m = re.fullmatch(r'norm_list\.(\d+)\.(weight|bias)', key)
        if m:   # SVT norm_after_stage norms
            out.ln(f'norm{m.group(1)}', m.group(2), v)
            continue
        m = re.fullmatch(r'blocks\.(\d+)\.(\d+)\.(.+)', key)
        if m is None:
            continue
        base = f'block{m.group(1)}_{m.group(2)}'
        prefix = '' if is_svt else 'ffn/'
        _mit_block(out, base, m.group(3), v, ffn_prefix=prefix)
        if not is_svt and m.group(3) == 'mlp.fc1.bias':
            fc1_dims[base] = _np(v).shape[0]
    if not is_svt:
        for base, hidden in fc1_dims.items():
            out.p(f'{base}/ffn/dwconv/conv/kernel',
                  _identity_dwconv(3, hidden))
            out.p(f'{base}/ffn/dwconv/conv/bias',
                  np.zeros((hidden,), np.float32))
    return out.variables()


# --------------------------------------------------------------------------
# STDC (official layout — ≙ reference stdc2mmseg.py)
# --------------------------------------------------------------------------

def convert_stdc(state_dict: Dict[str, Any],
                 blocks_per_stage: Tuple[int, ...] = (2, 2, 2)
                 ) -> Dict[str, Any]:
    """Official STDC ``features.N`` flat list → stems + stage blocks.

    ``blocks_per_stage``: (2,2,2) for STDC1, (4,5,3) for STDC2.
    """
    sd = _strip_prefixes(state_dict)
    # features.0/1 are the two stem ConvX; the rest are CatBottlenecks
    stage_of = {}
    idx = 2
    for s, n in enumerate(blocks_per_stage):
        for j in range(n):
            stage_of[idx] = f'stage{s}_{j}'
            idx += 1
    out = _Out()

    def convx(prefix, member, leaf, v):
        if member == 'conv':
            out.p(f'{prefix}/conv_m/conv/kernel', _conv_w(v))
        elif leaf in ('weight', 'bias'):
            out.ln(f'{prefix}/bn', leaf, v)
        elif leaf in ('running_mean', 'running_var'):
            out.bn_stat(f'{prefix}/bn', leaf, v)

    for key, v in sd.items():
        if key.startswith('cp.'):   # STDC-Seg wraps the trunk as `cp.`
            key = key[3:]
        if key.endswith('num_batches_tracked') or not \
                key.startswith('features.'):
            continue
        parts = key.split('.')
        n = int(parts[1])
        if n in (0, 1):
            convx(f'stem{n}', parts[2], parts[-1], v)
        elif n in stage_of:
            block = stage_of[n]
            if parts[2] == 'conv_list':
                convx(f'{block}/conv{parts[3]}', parts[4], parts[-1], v)
            elif parts[2] == 'avd_layer':
                member = 'conv' if parts[3] == '0' else 'bn'
                convx(f'{block}/downsample', member, parts[-1], v)
            elif parts[2] == 'skip':
                # AddBottleneck skip = Sequential(dw-conv, BN, 1x1, BN)
                # (official STDC-Seg; ≙ reference stdc.py:62-77) →
                # our skip0 (dw ConvModule) + skip1 (1x1 ConvModule)
                mod, member = {'0': ('skip0', 'conv'),
                               '1': ('skip0', 'bn'),
                               '2': ('skip1', 'conv'),
                               '3': ('skip1', 'bn')}[parts[3]]
                convx(f'{block}/{mod}', member, parts[-1], v)
    return out.variables()


# --------------------------------------------------------------------------
# merge into a model's variable tree
# --------------------------------------------------------------------------

def _flatten(tree, prefix=()):
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, 'items'):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _resize_pos_embed(pos: np.ndarray, dst_len: int) -> np.ndarray:
    """(1, L, C) with a leading cls token → (1, dst_len, C), grid part
    bilinearly resized (≙ reference ViT ``resize_pos_embed``)."""
    import jax
    n_extra = 1 if int(math.isqrt(pos.shape[1]))**2 != pos.shape[1] else 0
    grid, extra = pos[:, n_extra:], pos[:, :n_extra]
    dst_extra = 1 if int(math.isqrt(dst_len))**2 != dst_len else 0
    side = int(round(math.sqrt(grid.shape[1])))
    dst_side = int(round(math.sqrt(dst_len - dst_extra)))
    grid = grid.reshape(1, side, side, pos.shape[-1])
    grid = np.asarray(jax.image.resize(
        grid, (1, dst_side, dst_side, pos.shape[-1]), 'bilinear'))
    grid = grid.reshape(1, dst_side * dst_side, pos.shape[-1])
    if dst_extra and n_extra:
        return np.concatenate([extra, grid], axis=1)
    if dst_extra:
        return np.concatenate([np.zeros_like(grid[:, :1]), grid], axis=1)
    return grid


def _resize_rel_table(table: np.ndarray, dst_len: int,
                      src_extra: int = 0, dst_extra: int = 0) -> np.ndarray:
    """((2w-1)² [+extra], nH) rel-pos table resized to a new window size."""
    import jax
    body, extra = table[:table.shape[0] - src_extra], \
        table[table.shape[0] - src_extra:]
    side = int(round(math.sqrt(body.shape[0])))
    dst_side = int(round(math.sqrt(dst_len - dst_extra)))
    grid = body.reshape(1, side, side, table.shape[-1])
    grid = np.asarray(jax.image.resize(
        grid, (1, dst_side, dst_side, table.shape[-1]), 'bilinear'))
    body = grid.reshape(dst_side * dst_side, table.shape[-1])
    if dst_extra:
        pad = extra[:dst_extra] if src_extra >= dst_extra else \
            np.zeros((dst_extra, table.shape[-1]), np.float32)
        return np.concatenate([body, pad], axis=0)
    return body


def merge_pretrained(template: Dict[str, Any], converted: Dict[str, Any],
                     resize_mismatched: bool = True):
    """Overlay converted leaves onto a model's init variables.

    Returns (merged_variables, info) where info lists ``missing`` (template
    leaves kept at init), ``unexpected`` (converted leaves with no home) and
    ``resized`` (geometry-adapted leaves). Mirrors the semantics of torch
    ``load_state_dict(strict=False)`` + mmseg's pos-embed interpolation.
    """
    t_flat = {col: _flatten(tree) for col, tree in template.items()}
    c_flat = {col: _flatten(tree) for col, tree in converted.items()}
    missing, unexpected, resized = [], [], []
    merged = {}
    for col, t_leaves in t_flat.items():
        c_leaves = c_flat.get(col, {})
        out = {}
        for path, leaf in t_leaves.items():
            t_shape = tuple(np.shape(leaf))
            if path not in c_leaves:
                missing.append((col,) + path)
                out[path] = leaf
                continue
            cand = c_leaves[path]
            if tuple(cand.shape) == t_shape:
                out[path] = cand.astype(np.asarray(leaf).dtype) \
                    if hasattr(cand, 'astype') else cand
            elif resize_mismatched and path[-1] == 'pos_embed' and \
                    cand.ndim == 3:
                out[path] = _resize_pos_embed(cand, t_shape[1])
                resized.append((col,) + path)
            elif resize_mismatched and \
                    path[-1] == 'relative_position_bias_table':
                src_extra = cand.shape[0] - int(round(math.sqrt(
                    cand.shape[0])))**2
                dst_extra = t_shape[0] - int(round(math.sqrt(
                    t_shape[0])))**2
                out[path] = _resize_rel_table(cand, t_shape[0],
                                              src_extra, dst_extra)
                resized.append((col,) + path)
            else:
                raise ValueError(
                    f'shape mismatch at {col}/{"/".join(path)}: checkpoint '
                    f'{tuple(cand.shape)} vs model {t_shape}')
        for path in c_leaves:
            if path not in t_leaves:
                unexpected.append((col,) + path)
        merged[col] = _unflatten(out)
    for col in c_flat:
        if col not in t_flat:
            for path in c_flat[col]:
                unexpected.append((col,) + path)
    info = dict(missing=missing, unexpected=unexpected, resized=resized)
    return merged, info


CONVERTERS = {
    'vit': convert_vit,
    'swin': convert_swin,
    'mit': convert_mit,
    'beit': convert_beit,
    'twins': convert_twins,
    'stdc': convert_stdc,
}
