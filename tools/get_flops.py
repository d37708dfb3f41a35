"""FLOPs/params counter (≙ reference ``tools/get_flops.py``), TPU-native:
uses XLA's own cost model via ``jit(...).lower().compile().cost_analysis()``
instead of module hooks."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.models import build_segmentor
from stc_unet_tpu.utils import Config


def parse_args():
    parser = argparse.ArgumentParser(description='Get FLOPs of a segmentor')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--shape', type=int, nargs='+', default=[2048, 1024],
                        help='input image size (h w) or a single square size')
    return parser.parse_args()


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def main():
    args = parse_args()
    if len(args.shape) == 1:
        h = w = args.shape[0]
    elif len(args.shape) == 2:
        h, w = args.shape
    else:
        raise ValueError('invalid input shape')
    cfg = Config.fromfile(args.config)
    cfg.model.pretrained = None
    model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
    variables = model.init_weights(seed=0, input_size=(64, 64))
    net = model.net

    def fwd(variables, img):
        return net.apply(variables, img, train=False)

    img = jnp.zeros((1, h, w, 3), jnp.float32)
    compiled = jax.jit(fwd).lower(variables, img).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get('flops', float('nan'))
    n_params = count_params(variables['params'])

    split_line = '=' * 30
    print(f'{split_line}\nInput shape: {(3, h, w)}\n'
          f'Flops: {flops / 1e9:.2f} GFLOPs\n'
          f'Params: {n_params / 1e6:.2f} M\n{split_line}')
    print('!!! XLA cost analysis counts fused-program flops; comparisons '
          'with hook-based counters are approximate.')


if __name__ == '__main__':
    main()
