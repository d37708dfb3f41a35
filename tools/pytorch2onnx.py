"""ONNX-export entry, reference argv (≙ reference ``tools/pytorch2onnx.py``).

The TPU-native portable-artifact format is StableHLO, not ONNX — this
entry maps the reference's argv onto the AOT exporter
(``tools/deployment/export_aot.py``) so existing export scripts keep
working: the output is a ``.stablehlo`` program plus the same optional
runtime parity check (``--verify-export`` ≙ the reference's ORT check).

    python tools/pytorch2onnx.py CONFIG --checkpoint CKPT \
        --shape 512 512 --output-file model.stablehlo [--verify-export]
"""
from __future__ import annotations

import argparse
import os.path as osp
import runpy
import sys

_TOOLS = osp.dirname(osp.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(
        description='Export an inference program (StableHLO; '
                    'reference pytorch2onnx argv)')
    parser.add_argument('config')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--input-img', default=None,
                        help='accepted for argv parity (shape-driven here)')
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--output-file', default='model.stablehlo')
    parser.add_argument('--opset-version', type=int, default=11,
                        help='ignored: StableHLO has no opset')
    parser.add_argument('--show', action='store_true', help='ignored')
    parser.add_argument('--verify', '--verify-export', dest='verify',
                        action='store_true')
    parser.add_argument('--dynamic-export', action='store_true',
                        help='ignored: XLA programs are shape-specialized')
    parser.add_argument('--cfg-options', nargs='+', default=None,
                        help='unsupported here; edit the config instead')
    args = parser.parse_args()
    if args.dynamic_export:
        print('note: --dynamic-export ignored (XLA specializes shapes; '
              'export one artifact per shape)')

    argv = ['export_aot.py', args.config]
    if args.checkpoint:
        argv.append(args.checkpoint)
    argv += ['--shape', *map(str, args.shape), '--out', args.output_file,
             '--format', 'stablehlo', '--dtype', 'float32']
    if args.verify:
        argv.append('--verify')
    sys.argv = argv
    runpy.run_path(osp.join(_TOOLS, 'deployment', 'export_aot.py'),
                   run_name='__main__')


if __name__ == '__main__':
    main()
