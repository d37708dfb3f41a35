"""Convert an official STDC checkpoint to flax variables
(≙ reference ``tools/model_converters/stdc2mmseg.py``).

    python tools/model_converters/stdc2jax.py SRC.pth DST.ckpt --type STDC1
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))
from _common import run

if __name__ == '__main__':
    run('stdc', __doc__.split('\n')[0], extra_args={
        '--type': dict(default='STDC1', choices=['STDC1', 'STDC2'],
                       help='architecture variant (block counts)')})
