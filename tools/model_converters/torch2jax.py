"""Convert a reference-fork torch checkpoint (.pth) into this framework's
.ckpt format (≙ reference ``tools/model_converters/*``; the reverse of
``vitjax2mmseg.py``).

    python tools/model_converters/torch2jax.py SRC.pth DST.ckpt --config CFG
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse


def main():
    parser = argparse.ArgumentParser(
        description='Convert torch STC-UNet checkpoints to jax')
    parser.add_argument('src', help='source torch .pth path')
    parser.add_argument('dst', help='destination .ckpt path')
    parser.add_argument('--config', default=None,
                        help='config to build the target model for '
                             'structural validation')
    args = parser.parse_args()

    from stc_unet_tpu.engine import save_checkpoint
    from stc_unet_tpu.utils.torch_convert import convert_torch_checkpoint

    model = None
    if args.config:
        from stc_unet_tpu.models import build_segmentor
        from stc_unet_tpu.utils import Config
        cfg = Config.fromfile(args.config)
        model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
        model.init_weights()
    variables, meta = convert_torch_checkpoint(args.src, model=model)
    save_checkpoint(args.dst, variables, meta=meta)
    print(f'wrote {args.dst}')


if __name__ == '__main__':
    main()
