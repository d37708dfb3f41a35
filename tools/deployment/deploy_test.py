"""Evaluate an AOT-compiled segmentor on a dataset
(≙ reference ``tools/deploy_test.py:22,101``).

The reference wraps ONNXRuntime/TensorRT engines in the BaseSegmentor
protocol and drives them through ``single_gpu_test``. The TPU-native
equivalent: AOT-compile (lower → compile ahead-of-time) the segmentor's
whole-mode / slide-mode XLA programs for the declared shape and install the
executables into the segmentor's jit-cache seams — the full protocol
(slide/whole, MultiScaleFlipAug TTA, --show/--show-dir, --format-only, every
dataset metric) then runs through the standard ``single_gpu_test`` path,
exactly like ``tools/test.py``, but on pre-compiled executables.

With the default --dtype float32 the AOT program is the same XLA lowering as
the jit path, so metrics match ``tools/test.py`` bitwise. --dtype bfloat16
trades exactness for speed (deployment mode).

Usage:
    python tools/deployment/deploy_test.py CONFIG [CKPT] --eval mDice \
        [--shape 512 512] [--batch 1] [--show-dir out/] [--format-only] \
        [--tta] [--opacity 0.5] [--eval-options k=v ...]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__))))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def _aot_wrap(compiled, fallback, expect_shape, cast_dtype):
    """Dispatch to the AOT executable on shape match; jit fallback
    otherwise (e.g. an odd-sized straggler image)."""
    stats = dict(aot=0, fallback=0)

    def fn(variables, img):
        img = jnp.asarray(img, cast_dtype)
        if tuple(img.shape) == tuple(expect_shape):
            stats['aot'] += 1
            return compiled(variables, img)
        stats['fallback'] += 1
        return fallback(variables, img)
    fn.stats = stats
    return fn


class AOTSegmentor:
    """BaseSegmentor-protocol wrapper over AOT-compiled executables.

    Everything except the hot XLA program (simple_test/aug_test plumbing,
    rescale, flip-averaging, show_result, CLASSES/PALETTE) delegates to the
    wrapped segmentor — the ≙ of the reference's ONNXRuntimeSegmentor
    subclassing BaseSegmentor (reference ``deploy_test.py:22``).
    """

    def __init__(self, cfg, checkpoint, shape, batch=1,
                 dtype=jnp.float32):
        from stc_unet_tpu.engine import load_checkpoint
        from stc_unet_tpu.models import build_segmentor
        model = build_segmentor(cfg.model, test_cfg=cfg.get('test_cfg'))
        model.init_weights()
        if checkpoint:
            load_checkpoint(model, checkpoint)
        model.variables = jax.tree_util.tree_map(jnp.asarray,
                                                 model.variables)
        self.model = model
        self.dtype = dtype
        h, w = shape
        img_shape = (batch, h, w, 3)
        example = jnp.zeros(img_shape, dtype)
        mode = (model.test_cfg or {}).get('mode', 'whole')
        if mode == 'slide':
            offsets, crop = model._slide_offsets(h, w)
            key = ('slide', img_shape, offsets, crop)
            fn = model._jit_slide(img_shape, offsets, crop)
            compiled = fn.lower(model.variables, example).compile()
            model._jit_cache[key] = _aot_wrap(compiled, fn, img_shape, dtype)
            self._installed = model._jit_cache[key]
        else:
            fn = model._jit_encode_decode()
            compiled = fn.lower(model.variables, example).compile()
            model._jit_cache['encode_decode'] = _aot_wrap(
                compiled, fn, img_shape, dtype)
            self._installed = model._jit_cache['encode_decode']

    # single_gpu_test drives the model through __call__ / protocol attrs
    def __call__(self, **kwargs):
        return self.model(**kwargs)

    def __getattr__(self, name):
        return getattr(self.model, name)


def _kv_options(items):
    out = {}
    for item in items or []:
        k, _, v = item.partition('=')
        try:
            v = json.loads(v)
        except (ValueError, json.JSONDecodeError):
            pass
        out[k] = v
    return out


def main():
    parser = argparse.ArgumentParser(
        description='Evaluate an AOT-compiled segmentor (reference '
                    'tools/deploy_test.py surface)')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--shape', type=int, nargs=2, default=[512, 512])
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--dtype', default='float32',
                        choices=['float32', 'bfloat16'],
                        help='float32 matches tools/test.py bitwise; '
                             'bfloat16 is the fast deployment mode')
    parser.add_argument('--eval', type=str, nargs='+',
                        help='metrics, e.g. mIoU mDice')
    parser.add_argument('--show', action='store_true')
    parser.add_argument('--show-dir', type=str)
    parser.add_argument('--opacity', type=float, default=0.5)
    parser.add_argument('--format-only', action='store_true')
    parser.add_argument('--tta', action='store_true',
                        help='force MultiScaleFlipAug flip TTA on')
    parser.add_argument('--eval-options', nargs='+',
                        help='k=v options for dataset.evaluate')
    parser.add_argument('--out', type=str,
                        help='write the metric dict to this json file')
    parser.add_argument('--parity-check', action='store_true',
                        help='assert AOT logits == jit logits on random '
                             'input before evaluating')
    args = parser.parse_args()

    from stc_unet_tpu.apis import single_gpu_test
    from stc_unet_tpu.datasets import build_dataloader, build_dataset
    from stc_unet_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    dtype = jnp.float32 if args.dtype == 'float32' else jnp.bfloat16
    if args.tta:
        # flip TTA through the standard pipeline flag
        for step in cfg.data.test['pipeline']:
            if step.get('type') == 'MultiScaleFlipAug':
                step['flip'] = True
    seg = AOTSegmentor(cfg, args.checkpoint, tuple(args.shape),
                       batch=args.batch, dtype=dtype)

    if args.parity_check:
        rng = np.random.RandomState(0)
        img = rng.rand(args.batch, *args.shape, 3).astype(np.float32)
        metas = [dict(ori_shape=tuple(args.shape) + (3,),
                      img_shape=tuple(args.shape) + (3,),
                      pad_shape=tuple(args.shape) + (3,), scale_factor=1.0,
                      flip=False) for _ in range(args.batch)]
        aot_out = np.stack(seg.model.simple_test(img, metas))
        # drop the installed executable → pure jit path
        seg.model._jit_cache.clear()
        jit_out = np.stack(seg.model.simple_test(img, metas))
        match = float((aot_out == jit_out).mean())
        print(f'AOT vs jit prediction agreement: {match:.4%}')
        assert match == 1.0 if args.dtype == 'float32' else match > 0.99
        # reinstall for the eval run
        seg = AOTSegmentor(cfg, args.checkpoint, tuple(args.shape),
                           batch=args.batch, dtype=dtype)

    dataset = build_dataset(cfg.data.test, default_args=dict(test_mode=True))
    loader = build_dataloader(dataset, samples_per_gpu=args.batch,
                              workers_per_gpu=0, dist=False, shuffle=False)
    eval_kwargs = _kv_options(args.eval_options)
    results = single_gpu_test(
        seg, loader, show=args.show, out_dir=args.show_dir,
        opacity=args.opacity, pre_eval=args.eval is not None,
        format_only=args.format_only,
        format_args=eval_kwargs if args.format_only else {})
    print(f"AOT dispatch: {seg._installed.stats['aot']} batches compiled-"
          f"path, {seg._installed.stats['fallback']} fallback")
    if args.eval:
        metric = dataset.evaluate(results, metric=args.eval, **eval_kwargs)
        out = {k: float(v) for k, v in metric.items()}
        print(json.dumps(out, indent=2))
        if args.out:
            with open(args.out, 'w') as f:
                json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()
