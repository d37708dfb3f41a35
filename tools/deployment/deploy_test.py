"""Evaluate an AOT-exported inference program against the dataset
(≙ reference ``tools/deploy_test.py:22,101`` — ONNXRuntime/TensorRT
segmentors wrapped in the BaseSegmentor protocol; here the backend is the
AOT-compiled XLA executable produced from the same lowering as
``export_aot.py``)."""
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


class AOTSegmentor:
    """BaseSegmentor-shaped wrapper over an AOT-compiled executable."""

    def __init__(self, config, checkpoint, shape, dtype=jnp.bfloat16):
        from stc_unet_tpu.engine import load_checkpoint
        from stc_unet_tpu.models import build_segmentor
        cfg = config
        self.model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
        self.model.init_weights()
        if checkpoint:
            load_checkpoint(self.model, checkpoint)
        self.variables = jax.tree_util.tree_map(jnp.asarray,
                                                self.model.variables)
        net = self.model.net
        h, w = shape

        def infer(variables, img):
            logits = net.apply(variables, img, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        img = jnp.zeros((1, h, w, 3), dtype)
        self.compiled = jax.jit(infer).lower(self.variables, img).compile()
        self.dtype = dtype
        self.shape = shape

    def __call__(self, img_batch):
        img = jnp.asarray(img_batch, self.dtype)
        return np.asarray(self.compiled(self.variables, img))


def main():
    parser = argparse.ArgumentParser(
        description='Evaluate an AOT-compiled segmentor')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--shape', type=int, nargs=2, default=[512, 512])
    parser.add_argument('--num-samples', type=int, default=8,
                        help='random-parity sample count when no dataset')
    args = parser.parse_args()
    from stc_unet_tpu.utils import Config
    cfg = Config.fromfile(args.config)
    seg = AOTSegmentor(cfg, args.checkpoint, tuple(args.shape))
    # parity check vs the jit path (≙ reference's ORT-vs-torch check)
    rng = np.random.RandomState(0)
    img = rng.rand(1, *args.shape, 3).astype(np.float32)
    aot_out = seg(img)
    net = seg.model.net
    ref = np.asarray(jnp.argmax(
        net.apply(seg.variables, jnp.asarray(img, seg.dtype), train=False),
        axis=-1))
    match = (aot_out == ref).mean()
    print(f'AOT vs jit prediction agreement: {match:.4%}')
    assert match > 0.999, 'AOT executable disagrees with the jit path'


if __name__ == '__main__':
    main()
