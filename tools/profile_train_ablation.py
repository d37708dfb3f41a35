"""Backward-pass component ablation of the STC-UNet train step.

Round-3 follow-up to the train-step profile: the standalone conv probe
(`profile_stage_roofline.py --bwd`) shows conv backward running FASTER
per-FLOP than forward at both 64 and 128 channels, so the step's
bwd ≈ 3.6× fwd cannot be generic conv-backward inefficiency. This tool
attributes it: for each model variant (STC module toggled off by cfg
surgery, the same toggles as `profile_ablation.py`), time forward+loss
and value_and_grad at B=8 512² bf16 and report each component's share of
the backward.

Usage: python tools/profile_train_ablation.py [--batch 8] [--iters 6]
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


def _time(fn, *args, iters=6, warmup=1):
    out = fn(*args)
    jnp.sum(out if not isinstance(out, tuple) else out[0]).block_until_ready()
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--iters', type=int, default=6)
    ap.add_argument('--out', default=None)
    ap.add_argument('--only', default=None,
                    help='comma-separated variant names to run')
    args = ap.parse_args()
    only = set(args.only.split(',')) if args.only else None

    from __graft_entry__ import _flagship_cfg
    from stc_unet_tpu.models import build_segmentor

    B = args.batch
    imgf = jnp.asarray(np.random.RandomState(0).rand(B, 512, 512, 3),
                       jnp.float32)
    gt = jnp.asarray((np.asarray(imgf).mean(-1) > 0.5).astype(np.int32))
    rng = jax.random.PRNGKey(0)

    def variant(name, surgery, train_mode=True):
        if only is not None and name not in only:
            return None
        cfg = _flagship_cfg()
        surgery(cfg)
        model = build_segmentor(cfg)
        model.init_weights(seed=0, input_size=(64, 64))
        variables = jax.tree_util.tree_map(jnp.asarray, model.variables)

        def loss_only(variables, img, gt, rng):
            losses, _ = model.compute_losses(
                variables, img.astype(jnp.bfloat16), gt, rng,
                train=train_mode)
            return sum(jnp.mean(v) for k, v in losses.items() if 'loss' in k)

        def vg(variables, img, gt, rng):
            def f(params):
                v = dict(variables, params=params)
                losses, _ = model.compute_losses(
                    v, img.astype(jnp.bfloat16), gt, rng, train=train_mode)
                return sum(jnp.mean(x) for k, x in losses.items()
                           if 'loss' in k)
            # return the grads as program OUTPUTS — returning only the loss
            # lets XLA dead-code-eliminate the whole backward (measured:
            # vg_ms == fwd_ms exactly)
            return jax.value_and_grad(f)(variables['params'])

        fwd = _time(jax.jit(loss_only), variables, imgf, gt, rng,
                    iters=args.iters) * 1e3
        both = _time(jax.jit(vg), variables, imgf, gt, rng,
                     iters=args.iters) * 1e3
        row = dict(fwd_ms=round(fwd, 1), vg_ms=round(both, 1),
                   bwd_ms=round(both - fwd, 1),
                   bwd_over_fwd=round((both - fwd) / fwd, 2))
        print('PARTIAL', name, json.dumps(row), flush=True)
        return row

    report = {'batch': B}
    report['full'] = variant('full', lambda cfg: None)

    def no_ksa(cfg):
        cfg['backbone']['context_layer'] = None
    report['no_ksa'] = variant('no_ksa', no_ksa)

    def no_tr(cfg):
        cfg['backbone']['transformer_block'] = False
    report['no_transformer'] = variant('no_transformer', no_tr)

    def no_se(cfg):
        cfg['decode_head']['se'] = False
    report['no_se'] = variant('no_se', no_se)

    def plain(cfg):
        no_ksa(cfg); no_tr(cfg); no_se(cfg)
    report['plain_unet'] = variant('plain_unet', plain)

    # BN backward cost: same full model, eval-mode BN (running stats →
    # backward through BN is a per-channel scale, no batch-stat chain)
    report['full_bn_eval'] = variant('full_bn_eval', lambda cfg: None,
                                     train_mode=False)

    def ce_only(cfg):
        cfg['decode_head']['loss_decode'] = [dict(
            type='CrossEntropyLoss', use_sigmoid=False,
            loss_name='loss_bce', loss_weight=1.0)]
    report['ce_only_loss'] = variant('ce_only_loss', ce_only)

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)


if __name__ == '__main__':
    main()
