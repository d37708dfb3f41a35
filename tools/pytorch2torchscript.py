"""TorchScript-export entry, reference argv
(≙ reference ``tools/pytorch2torchscript.py``).

TorchScript's role (a self-contained serialized program runnable without
the Python model definition) maps to StableHLO on TPU. This entry keeps
the reference argv and delegates to the AOT exporter; ``--verify`` runs
the exported program against the eager forward (the reference's
torch-vs-script check).

    python tools/pytorch2torchscript.py CONFIG --checkpoint CKPT \
        --output-file model.stablehlo [--verify]
"""
from __future__ import annotations

import argparse
import os.path as osp
import runpy
import sys

_TOOLS = osp.dirname(osp.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(
        description='Export a self-contained inference program '
                    '(reference pytorch2torchscript argv)')
    parser.add_argument('config')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--show', action='store_true', help='ignored')
    parser.add_argument('--verify', action='store_true')
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--output-file', default='model.stablehlo')
    args = parser.parse_args()

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
