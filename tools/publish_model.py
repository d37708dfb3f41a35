"""Strip a checkpoint for release and append its content hash
(≙ reference ``tools/publish_model.py``)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import hashlib
import subprocess

from stc_unet_tpu.engine import load_checkpoint_file, save_checkpoint


def main():
    parser = argparse.ArgumentParser(
        description='Process a checkpoint for publishing')
    parser.add_argument('in_file', help='input checkpoint filename')
    parser.add_argument('out_file', help='output checkpoint filename')
    args = parser.parse_args()
    ckpt = load_checkpoint_file(args.in_file)
    # drop the optimizer state (reference behavior)
    out_file = args.out_file
    if out_file.endswith('.ckpt'):
        out_file = out_file[:-5]
    tmp = out_file + '.ckpt'
    save_checkpoint(tmp, ckpt['variables'], opt_state=None,
                    step=ckpt.get('step', 0), meta=ckpt.get('meta'))
    with open(tmp, 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    final = f'{out_file}-{sha[:8]}.ckpt'
    subprocess.run(['mv', tmp, final], check=True)
    print(f'published to {final}')


if __name__ == '__main__':
    main()
