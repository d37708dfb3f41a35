"""Convert an official beit checkpoint to flax variables
(≙ reference ``tools/model_converters/beit2mmseg.py``).

    python tools/model_converters/beit2jax.py SRC.pth DST.ckpt
"""
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.abspath(__file__)))
from _common import run

if __name__ == '__main__':
    run('beit', __doc__.split('\n')[0])
