"""AOT-compile and serialize an inference executable
(≙ reference ``tools/pytorch2onnx.py`` + ``tools/deploy_test.py`` — the
TPU-native deployment path: instead of ONNX/TensorRT, export the jit-lowered
StableHLO / serialized XLA executable of the whole inference program).

    python tools/deployment/export_aot.py CONFIG [CKPT] --shape 512 512 \
        --out model.stablehlo

The exported artifact can be reloaded and executed without the framework:
StableHLO text is portable across jax versions; the serialized executable
(--format executable) is fastest to load but device/version-pinned.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description='Export an AOT-compiled inference program')
    parser.add_argument('config', help='config file path')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--format', default='stablehlo',
                        choices=['stablehlo', 'executable'])
    parser.add_argument('--out', default='model.stablehlo')
    parser.add_argument('--verify', action='store_true',
                        help='run the exported program and compare with '
                             'eager output (≙ the ONNX parity check)')
    return parser.parse_args()


def main():
    args = parse_args()
    from stc_unet_tpu.engine import load_checkpoint
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    cfg.model.pretrained = None
    model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
    model.init_weights()
    if args.checkpoint:
        load_checkpoint(model, args.checkpoint)
    variables = jax.tree_util.tree_map(jnp.asarray, model.variables)
    net = model.net
    h, w = (args.shape * 2)[:2]
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    img = jnp.zeros((args.batch, h, w, 3), dtype)

    # full inference program: forward + resize-to-input + argmax
    def infer(variables, img):
        logits = net.apply(variables, img, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    lowered = jax.jit(infer).lower(variables, img)
    if args.format == 'stablehlo':
        text = lowered.as_text()
        with open(args.out, 'w') as f:
            f.write(text)
        print(f'wrote StableHLO ({len(text)} chars) to {args.out}')
    else:
        compiled = lowered.compile()
        blob = compiled.runtime_executable().serialize() \
            if hasattr(compiled, 'runtime_executable') else None
        if blob is None:
            raise RuntimeError('executable serialization unsupported on '
                               'this backend; use --format stablehlo')
        with open(args.out, 'wb') as f:
            f.write(blob)
        print(f'wrote serialized executable ({len(blob)} bytes) to '
              f'{args.out}')

    if args.verify:
        compiled = lowered.compile()
        x = jnp.asarray(np.random.RandomState(0).rand(args.batch, h, w, 3),
                        dtype)
        got = np.asarray(compiled(variables, x))
        expected = np.asarray(infer(variables, x))
        assert (got == expected).all(), 'AOT output mismatch'
        print('verified: AOT output matches eager output')


if __name__ == '__main__':
    main()
