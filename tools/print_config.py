"""Dump a resolved config (≙ reference ``tools/print_config.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse

from stc_unet_tpu.utils import Config


def main():
    parser = argparse.ArgumentParser(description='Print the whole config')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--options', nargs='+',
                        help='config overrides key=value')
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.options:
        import ast
        opts = {}
        for kv in args.options:
            k, v = kv.split('=', maxsplit=1)
            try:
                opts[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                opts[k] = v
        cfg.merge_from_dict(opts)
    print(f'Config:\n{cfg.pretty_text}')


if __name__ == '__main__':
    main()
