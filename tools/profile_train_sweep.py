"""Train-step batch sweep with amortized-readback timing (bench protocol).

Times N queued steps bounded by one final host readback — the same
protocol as bench.py — so tunnel readback latency (~36 ms/call) does not
inflate per-step numbers the way per-call readback in profile_train.py
does.  Usage: python tools/profile_train_sweep.py [--batches 6 8 10 12 14]
[--remat-batches 16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np


def measure(model, tx, variables, b, remat=False, iters=8):
    from stc_unet_tpu.engine import TrainState, make_train_step
    img = jnp.asarray(np.random.RandomState(1).rand(b, 512, 512, 3),
                      jnp.float32)
    gt = jnp.asarray((np.asarray(img).mean(-1) > 0.5).astype(np.int32))
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.array, variables), tx)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                           remat=remat)
    rng = jax.random.PRNGKey(0)
    state, lv = step(state, img, gt, rng)
    float(lv['loss'])  # compile + settle
    state, lv = step(state, img, gt, rng)
    float(lv['loss'])
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        state, lv = step(state, img, gt, rng)   # queue async
    state, lv = step(state, img, gt, rng)
    float(lv['loss'])                            # one readback bounds all
    dt = (time.perf_counter() - t0) / iters
    del state, step, img, gt
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='+',
                    default=[6, 8, 10, 12, 14])
    ap.add_argument('--remat-batches', type=int, nargs='*', default=[])
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx

    cfg = _flagship_cfg()
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(64, 64))
    variables = jax.tree_util.tree_map(np.asarray, model.variables)
    schedule = build_lr_schedule(
        dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
        base_lr=1e-5, max_iters=1000)
    tx = build_optimizer_tx(dict(type='Adam', lr=1e-5, betas=(0.9, 0.999)),
                            schedule=schedule)

    out = {}
    for b in args.batches:
        try:
            dt = measure(model, tx, variables, b)
            out[f'b{b}'] = dict(ms=round(dt * 1e3, 1),
                                img_s=round(b / dt, 2))
        except Exception as e:
            out[f'b{b}'] = repr(e)[:100]
        print('PARTIAL', json.dumps(out), flush=True)
    for b in args.remat_batches:
        try:
            dt = measure(model, tx, variables, b, remat=True)
            out[f'b{b}_remat'] = dict(ms=round(dt * 1e3, 1),
                                      img_s=round(b / dt, 2))
        except Exception as e:
            out[f'b{b}_remat'] = repr(e)[:100]
        print('PARTIAL', json.dumps(out), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
