"""torch→jax checkpoint conversion for the STC-UNet model family.

≙ the reference's ``tools/model_converters/*`` scripts (esp.
``vitjax2mmseg.py``, which shows the jax↔torch key-mapping pattern in the
opposite direction). Translates a torch ``state_dict`` from the reference
fork (``UnetBackbone``/``UnetHead`` attribute names, see reference
``mmseg/models/backbones/unet_backbone.py`` / ``decode_heads/unet_head.py``)
into this framework's flax variables.

Tensor layout transforms:
- conv ``weight`` OIHW → HWIO (grouped convs transform identically);
- linear ``weight`` (out, in) → (in, out);
- BN ``weight``/``bias`` → ``scale``/``bias`` params, ``running_mean/var`` →
  ``batch_stats`` ``mean``/``var``; ``num_batches_tracked`` dropped;
- ``nn.MultiheadAttention`` packed ``in_proj_weight``/``bias`` kept verbatim
  (our MHA stores the torch parameterization on purpose — see
  ``models/backbones/unet_backbone.py:MultiheadAttention``).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

_DC = {'0': ('conv0', 'conv'), '1': ('bn1',), '3': ('conv3', 'conv'),
       '4': ('bn4',)}


def _double_conv(idx: str):
    if idx not in _DC:
        raise KeyError(f'unexpected DoubleConv index {idx}')
    return _DC[idx]


def translate_key(torch_key: str):
    """One torch state_dict key → (flax path tuple, transform tag).

    Returns None for keys to drop (num_batches_tracked).
    The flax path EXCLUDES the collection; BN running stats get tag 'bn_stat'
    which routes them into batch_stats.
    """
    parts = torch_key.split('.')
    if parts[-1] == 'num_batches_tracked':
        return None
    head, rest = parts[0], parts[1:]
    out = [head]
    tag = 'param'
    i = 0
    while i < len(rest):
        p = rest[i]
        if p == 'inc' and rest[i + 1] == 'conv':
            # inc.conv.conv.{i} → inc/<dc>
            out.append('inc')
            out.extend(_double_conv(rest[i + 3]))
            i += 4
        elif re.fullmatch(r'down\d', p):
            # down{k}.down_conv.1.conv.{i} → down{k}/conv/<dc>
            out.append(p)
            out.append('conv')
            out.extend(_double_conv(rest[i + 4]))
            i += 5
        elif re.fullmatch(r'context_layer\d_\d', p):
            out.append(p)
            nxt = rest[i + 1]
            if nxt == 'convs':
                k = rest[i + 2]
                if rest[i + 3] == '0':
                    out.extend((f'conv{k}', 'conv'))
                else:
                    out.append(f'bn{k}')
                i += 4
            elif nxt == 'fc':
                out.extend(('fc', 'linear'))
                i += 2
            elif nxt == 'fcs':
                out.extend((f'fcs{rest[i + 2]}', 'linear'))
                i += 3
            else:
                raise KeyError(f'unknown KSA member in {torch_key}')
        elif re.fullmatch(r'aspp\d', p):
            out.append(p)
            nxt = rest[i + 1]
            if nxt == 'linear':
                out.extend(('linear', 'linear'))
                i += 2
            elif nxt == 'tr':
                out.append(f'tr{rest[i + 2]}')
                member = rest[i + 3]
                if member in ('q', 'k', 'v', 'fc1', 'fc2'):
                    out.extend((member, 'linear'))
                    i += 4
                elif member == 'ma':
                    if rest[i + 4] in ('in_proj_weight', 'in_proj_bias'):
                        out.extend(('ma', rest[i + 4]))
                        return tuple(out), 'verbatim'
                    elif rest[i + 4] == 'out_proj':
                        out.extend(('ma', 'out_proj', 'linear'))
                        i += 5
                    else:
                        raise KeyError(f'unknown MHA member in {torch_key}')
                else:
                    raise KeyError(f'unknown tr member in {torch_key}')
            else:
                raise KeyError(f'unknown aspp member in {torch_key}')
        elif re.fullmatch(r'up\d', p):
            out.append(p)
            nxt = rest[i + 1]
            if nxt == 'conv':
                out.append('conv')
                out.extend(_double_conv(rest[i + 3]))
                i += 4
            elif nxt == 'ca':
                out.append('ca')
                member = rest[i + 2]
                if member in ('conv1', 'conv_h', 'conv_w'):
                    out.extend((member, 'conv'))
                else:
                    out.append(member)  # bn1
                i += 3
            else:
                raise KeyError(f'unknown Up member in {torch_key}')
        elif p == 'conv_seg':
            out.extend(('conv_seg', 'conv'))
            i += 1
        else:
            raise KeyError(f'cannot translate key: {torch_key}')
        # after a structural match, the remaining part must be the leaf
        if i == len(rest) - 1:
            break
    leaf = rest[-1]
    is_bn = out[-1].startswith('bn') or out[-1].startswith('gn')
    is_linear = out[-1] == 'linear'
    if leaf == 'weight':
        if is_bn:
            out.append('scale')
            tag = 'verbatim'
        elif is_linear:
            out.append('kernel')
            tag = 'linear_w'
        else:
            out.append('kernel')
            tag = 'conv_w'
    elif leaf == 'bias':
        out.append('bias')
        tag = 'verbatim'
    elif leaf == 'running_mean':
        out.append('mean')
        tag = 'bn_stat'
    elif leaf == 'running_var':
        out.append('var')
        tag = 'bn_stat'
    else:
        raise KeyError(f'unknown leaf {leaf} in {torch_key}')
    return tuple(out), tag


def _transform(value: np.ndarray, tag: str) -> np.ndarray:
    if tag == 'conv_w':
        return np.transpose(value, (2, 3, 1, 0))
    if tag == 'linear_w':
        return np.transpose(value, (1, 0))
    return value


def convert_state_dict(state_dict: Dict[str, Any]):
    """torch state_dict → (params, batch_stats) nested dicts (numpy)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def insert(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        translated = translate_key(key)
        if translated is None:
            continue
        path, tag = translated
        value = np.asarray(value.detach().cpu().numpy()
                           if hasattr(value, 'detach') else value,
                           np.float32)
        value = _transform(value, tag)
        if tag == 'bn_stat':
            insert(batch_stats, path, value)
        else:
            insert(params, path, value)
    return params, batch_stats


def convert_torch_checkpoint(ckpt_path_or_dict, model=None):
    """Load a reference .pth and return flax ``variables`` (+ meta).

    ``model`` (optional): a built segmentor whose variable tree is used for
    structural validation (every leaf must be filled, shapes must match).
    """
    if isinstance(ckpt_path_or_dict, str):
        import torch
        ckpt = torch.load(ckpt_path_or_dict, map_location='cpu',
                          weights_only=False)
    else:
        ckpt = ckpt_path_or_dict
    meta = ckpt.get('meta', {}) if isinstance(ckpt, dict) else {}
    state_dict = ckpt.get('state_dict', ckpt)
    params, batch_stats = convert_state_dict(state_dict)
    variables = {'params': params}
    if batch_stats:
        variables['batch_stats'] = batch_stats
    if model is not None:
        import jax
        template = model.variables or model.init_weights()
        t_leaves = jax.tree_util.tree_leaves_with_path(template)
        c_flat = {}

        def flatten(tree, prefix=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    flatten(v, prefix + (k,))
                else:
                    c_flat[prefix + (k,)] = v
        flatten(variables)
        for path, leaf in t_leaves:
            key = tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                        for p in path)
            if key not in c_flat:
                raise KeyError(f'converted checkpoint is missing {key}')
            if tuple(c_flat[key].shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f'shape mismatch at {key}: checkpoint '
                    f'{c_flat[key].shape} vs model {np.shape(leaf)}')
    return variables, meta
