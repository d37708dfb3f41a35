"""Shared CLI driver for the official-checkpoint converters
(≙ reference ``tools/model_converters/{vit,swin,mit,beit,twins,stdc}
2mmseg.py``). Each family script parses argv and calls :func:`run`."""
from __future__ import annotations

import argparse
import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)


def run(family: str, description: str, extra_args=None):
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('src', help='official torch checkpoint (.pth)')
    parser.add_argument('dst', help='output .ckpt path')
    parser.add_argument('--backbone-key', default='backbone',
                        help='wrap converted params under this key so the '
                             'result loads into a full segmentor tree '
                             '(pass "" to keep a bare backbone tree)')
    for flag, kwargs in (extra_args or {}).items():
        parser.add_argument(flag, **kwargs)
    args = parser.parse_args()

    import torch
    from stc_unet_tpu.engine.checkpoint import save_checkpoint
    from stc_unet_tpu.utils.backbone_convert import CONVERTERS

    ckpt = torch.load(args.src, map_location='cpu', weights_only=False)
    convert = CONVERTERS[family]
    kwargs = {}
    if family == 'stdc':
        kwargs['blocks_per_stage'] = \
            (4, 5, 3) if args.type == 'STDC2' else (2, 2, 2)
    variables = convert(ckpt, **kwargs)
    if args.backbone_key:
        variables = {col: {args.backbone_key: tree}
                     for col, tree in variables.items()}
    save_checkpoint(args.dst, variables,
                    meta=dict(source=args.src, converter=family))
    n = sum(1 for _ in _leaves(variables))
    print(f'wrote {args.dst} ({n} tensors)')


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v
