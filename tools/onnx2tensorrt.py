"""Engine-build entry, reference argv (≙ reference ``tools/onnx2tensorrt.py``).

TensorRT's role (compile the exported graph into a device-specialized
executable) maps to XLA AOT compilation on TPU: this entry takes the
model config (or a StableHLO file exported by ``pytorch2onnx.py``) and
produces a serialized, device-pinned XLA executable — the artifact
``deploy_test.py`` runs fastest from.

    python tools/onnx2tensorrt.py CONFIG --checkpoint CKPT \
        --shape 512 512 --output model.xla [--verify]
"""
from __future__ import annotations

import argparse
import os.path as osp
import runpy
import sys

_TOOLS = osp.dirname(osp.abspath(__file__))


def main():
    parser = argparse.ArgumentParser(
        description='Compile a device-specialized executable '
                    '(reference onnx2tensorrt argv)')
    parser.add_argument('config', help='model config (the graph source '
                                       'of truth; .onnx inputs have no '
                                       'TPU path)')
    parser.add_argument('--checkpoint', default=None)
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    parser.add_argument('--output', '--trt-file', dest='output',
                        default='model.xla')
    parser.add_argument('--fp16', action='store_true',
                        help='export with bfloat16 activations')
    parser.add_argument('--verify', action='store_true')
    parser.add_argument('--workspace-size', type=int, default=1,
                        help='ignored (XLA manages device memory)')
    args = parser.parse_args()

    argv = ['export_aot.py', args.config]
    if args.checkpoint:
        argv.append(args.checkpoint)
    argv += ['--shape', *map(str, args.shape), '--out', args.output,
             '--format', 'executable',
             '--dtype', 'bfloat16' if args.fp16 else 'float32']
    if args.verify:
        argv.append('--verify')
    sys.argv = argv
    runpy.run_path(osp.join(_TOOLS, 'deployment', 'export_aot.py'),
                   run_name='__main__')


if __name__ == '__main__':
    main()
