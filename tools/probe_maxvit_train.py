"""Round-4 train-tier probe for the two off-roofline models (MaxViT-UNet,
DC-UNet — VERDICT r3 weak #1).

Every healthy my_config model trains at ~3x its whole-mode cost; MaxViT-UNet
shipped at ~12x (B=8 full-block remat, 7.46 img/s — slower than B=4 plain
11.02) and DC-UNet at ~5.5x. The round-3 tier ladder took first-compile, not
best-of, and skipped the middle tiers between "remat everything" and "halve
the batch". This probe measures ALL of them on the real chip, recording for
each tier:

- compile outcome (the axon remote compile helper host-OOMs on the big
  plain programs — HTTP 500),
- ``compiled.memory_analysis()`` peak temp bytes (is the program HBM-bound?),
- throughput under the host-readback-bounded protocol of ``bench.py``.

MaxViT tiers: B=8 plain / attn-remat / dots-remat / block-remat, B=4 plain,
B=16 dots (does a bigger batch amortize the remat recompute?).
DC-UNet tiers: B=8 plain / loss_remat, B=4 plain.

Output: docs/data/maxvit_train_probe.json
Usage: python tools/probe_maxvit_train.py [--only MaxViT-UNet DC-UNet]
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_repo_root = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
if _repo_root not in _sys.path:
    _sys.path.insert(0, _repo_root)

import argparse
import copy
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 512
WARMUP = 2
ITERS = 10


def build_model(cfg_path, with_cp=None):
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.utils import Config
    cfg = Config.fromfile(cfg_path)
    cfg.model['pretrained'] = None
    for key in ('backbone', 'decode_head'):
        sub = cfg.model.get(key)
        if isinstance(sub, dict):
            sub.pop('pretrained', None)
            sub.pop('init_cfg', None)
    mcfg = copy.deepcopy(cfg.model)
    if with_cp is not None:
        for key in ('backbone', 'decode_head'):
            if isinstance(mcfg.get(key), dict):
                mcfg[key]['with_cp'] = with_cp
    return build_segmentor(mcfg, test_cfg=dict(mode='whole'))


def probe_tier(cfg_path, variables, b, mode):
    """Returns a record for one (batch, mode) tier."""
    from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx
    from stc_unet_tpu.engine import TrainState, make_train_step

    rec = {'batch': b, 'mode': mode}
    with_cp = {'plain': None, 'loss_remat': None, 'block': True,
               'attn': 'attn', 'dots': 'dots', 'hires': 'hires'}[mode]
    model = build_model(cfg_path, with_cp=with_cp)
    model.variables = variables

    schedule = build_lr_schedule(
        dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
        base_lr=1e-5, max_iters=1000)
    tx = build_optimizer_tx(
        dict(type='Adam', lr=1e-5, betas=(0.9, 0.999)), schedule=schedule)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                           remat=(mode == 'loss_remat'))
    # the step donates its state: give every tier fresh buffers (reusing
    # `variables` leaves across tiers raises "Array has been deleted")
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.array, variables), tx)
    rng = jax.random.PRNGKey(0)
    img_np = np.random.RandomState(0).rand(b, SIZE, SIZE, 3).astype(np.float32)
    img = jnp.asarray(img_np)
    gt = jnp.asarray((img_np.mean(-1) > 0.5).astype(np.int32))

    t0 = time.perf_counter()
    try:
        lowered = step.lower(state, img, gt, rng)
        compiled = lowered.compile()
        rec['compile_s'] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        rec['compile_error'] = repr(e)[:200]
        rec['compile_s'] = round(time.perf_counter() - t0, 1)
        return rec
    try:
        ma = compiled.memory_analysis()
        rec['peak_temp_gb'] = round(ma.temp_size_in_bytes / 2**30, 2)
        rec['args_gb'] = round(ma.argument_size_in_bytes / 2**30, 2)
    except Exception as e:  # memory_analysis availability varies by backend
        rec['memory_analysis_error'] = repr(e)[:120]

    try:
        # donated buffers: keep feeding the returned state back in
        for _ in range(WARMUP):
            state, lv = compiled(state, img, gt, rng)
            float(lv['loss'])
        t0 = time.perf_counter()
        for _ in range(ITERS - 1):
            state, lv = compiled(state, img, gt, rng)
        state, lv = compiled(state, img, gt, rng)
        float(lv['loss'])
        dt = (time.perf_counter() - t0) / ITERS
        rec['step_ms'] = round(dt * 1e3, 1)
        rec['img_per_sec'] = round(b / dt, 2)
    except Exception as e:
        rec['run_error'] = repr(e)[:200]
    return rec


MODELS = {
    'MaxViT-UNet': [(8, 'plain'), (8, 'attn'), (8, 'dots'), (8, 'block'),
                    (4, 'plain'), (16, 'dots')],
    'DC-UNet': [(8, 'plain'), (8, 'hires'), (8, 'block'), (8, 'loss_remat'),
                (4, 'plain')],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', nargs='*', default=None)
    ap.add_argument('--out', default=_osp.join(
        _repo_root, 'docs', 'data', 'maxvit_train_probe.json'))
    args = ap.parse_args()

    results = {}
    if _osp.exists(args.out):
        results = json.load(open(args.out))
    for name, tiers in MODELS.items():
        if args.only and name not in args.only:
            continue
        cfg_path = _osp.join(_repo_root, 'my_config', name + '.py')
        model = build_model(cfg_path)
        model.init_weights(seed=0, input_size=(SIZE, SIZE))
        variables = jax.tree_util.tree_map(jnp.asarray, model.variables)
        recs = results.setdefault(name, [])
        done = {(r['batch'], r['mode']) for r in recs}
        for b, mode in tiers:
            if (b, mode) in done:
                continue
            print(f'=== {name} B={b} {mode} ===', flush=True)
            try:
                rec = probe_tier(cfg_path, variables, b, mode)
            except Exception as e:
                rec = {'batch': b, 'mode': mode, 'error': repr(e)[:300]}
            recs.append(rec)
            print(json.dumps(rec), flush=True)
            json.dump(results, open(args.out, 'w'), indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
