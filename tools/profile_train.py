"""Ablation profiler for the pjit train step (VERDICT r2 item 1).

Times the full train step on the real chip (B x 512^2 bf16, flagship
STC-UNet) and its components, so the ~2.2x gap vs 3x-forward can be
attributed:  candidates from the r2 verdict are bwd conv layouts, the
full-res f32 loss (CE + one-hot Dice), BN stat plumbing and non-donated
buffers.  Protocol anchor: reference ``tools/benchmark.py:54-120``
(warmup-skip, host-readback bound — see memory/axon-tpu-quirks).

Usage:  python tools/profile_train.py [--batch 4] [--trace]
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


def _time(fn, *args, iters=6, warmup=2):
    """Median wall time of fn(*args); each call bounded by host readback."""
    for _ in range(warmup):
        out = fn(*args)
        _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.sum(leaf.astype(jnp.float32))
                              if leaf.ndim else leaf))



def _emit(report):
    import json as _json
    print('PARTIAL ' + _json.dumps(report), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--trace', action='store_true')
    ap.add_argument('--sweep-batch', action='store_true')
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from stc_unet_tpu.models import build_segmentor
    from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx
    from stc_unet_tpu.engine import TrainState, make_train_step

    B = args.batch
    cfg = _flagship_cfg()
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(64, 64))
    variables = jax.tree_util.tree_map(jnp.asarray, model.variables)
    # donation inside the train step consumes whatever buffers the state
    # aliases — every TrainState gets its own device copy
    def _fresh_vars():
        return jax.tree_util.tree_map(jnp.array, variables)
    model.variables = variables
    net = model.net

    schedule = build_lr_schedule(
        dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
        base_lr=1e-5, max_iters=1000)
    tx = build_optimizer_tx(dict(type='Adam', lr=1e-5, betas=(0.9, 0.999)),
                            schedule=schedule)

    rng = jax.random.PRNGKey(0)
    imgf = jnp.asarray(np.random.RandomState(0).rand(B, 512, 512, 3),
                       jnp.float32)
    gt = jnp.asarray((np.asarray(imgf).mean(-1) > 0.5).astype(np.int32))

    report = {}

    # -- 1. full step (bench.py configuration) ---------------------------
    state = TrainState.create(_fresh_vars(), tx)
    step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
    newstate, lv = step(state, imgf, gt, rng)   # compile (donates state!)
    _force(lv['loss'])
    # donation destroys `state`; keep stepping with the returned one and
    # time via per-call readback of the loss
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        newstate, lv = step(newstate, imgf, gt, rng)
        _force(lv['loss'])
        times.append(time.perf_counter() - t0)
    report['full_step_ms'] = round(float(np.median(times)) * 1e3, 1)
    _emit(report)

    try:
        compiled = step.lower(newstate, imgf, gt, rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        report['step_gflop'] = round(ca.get('flops', 0) / 1e9, 1)
        report['step_gbytes'] = round(ca.get('bytes accessed', 0) / 1e9, 2)
    except Exception as e:
        report['cost_err'] = repr(e)[:120]
    _emit(report)

    # -- 2. forward+loss only (value, train=True) ------------------------
    def loss_only(variables, img, gt, rng):
        losses, _ = model.compute_losses(
            variables, img.astype(jnp.bfloat16), gt, rng, train=True)
        total = sum(jnp.mean(v) for k, v in losses.items() if 'loss' in k)
        return total
    jloss = jax.jit(loss_only)
    report['fwd_loss_ms'] = round(
        _time(jloss, variables, imgf, gt, rng) * 1e3, 1)
    _emit(report)

    # -- 3. value_and_grad (no optimizer / state plumbing) ---------------
    def vg(variables, img, gt, rng):
        def f(params):
            v = dict(variables, params=params)
            losses, _ = model.compute_losses(
                v, img.astype(jnp.bfloat16), gt, rng, train=True)
            return sum(jnp.mean(x) for k, x in losses.items() if 'loss' in k)
        return jax.value_and_grad(f)(variables['params'])
    jvg = jax.jit(vg)
    report['fwd_bwd_ms'] = round(
        _time(jvg, variables, imgf, gt, rng) * 1e3, 1)
    _emit(report)

    # -- 4. eval-mode forward (the 99 TFLOP/s yardstick) ------------------
    @jax.jit
    def fwd_eval(variables, img):
        return net.apply(variables, img, train=False)
    bimg = imgf.astype(jnp.bfloat16)
    report['fwd_eval_ms'] = round(_time(fwd_eval, variables, bimg) * 1e3, 1)
    _emit(report)

    # -- 5. train-mode forward (BN batch stats + dropout rng) -------------
    @jax.jit
    def fwd_train(variables, img, rng):
        outs, _ = net.apply(variables, img, train=True,
                            rngs={'dropout': rng}, mutable=['batch_stats'],
                            method=type(net).forward_heads)
        return outs['decode']
    report['fwd_train_ms'] = round(
        _time(fwd_train, variables, bimg, rng) * 1e3, 1)
    _emit(report)

    # -- 6. loss math alone on fixed logits -------------------------------
    logits = fwd_train(variables, bimg, rng)
    head = model.decode_head

    @jax.jit
    def loss_math(logits, gt):
        d = head.loss_by_feat(logits, gt)
        return sum(jnp.mean(v) for k, v in d.items() if 'loss' in k)
    report['loss_math_ms'] = round(_time(loss_math, logits, gt) * 1e3, 2)
    _emit(report)

    # -- 7. optimizer update alone ----------------------------------------
    _, grads = jvg(variables, imgf, gt, rng)

    @jax.jit
    def opt_only(state, grads):
        import optax
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), new_opt
    state2 = TrainState.create(_fresh_vars(), tx)
    report['opt_update_ms'] = round(_time(opt_only, state2, grads) * 1e3, 2)
    _emit(report)

    # -- 8. remat variant --------------------------------------------------
    try:
        state3 = TrainState.create(_fresh_vars(), tx)
        step_r = make_train_step(model, tx, compute_dtype=jnp.bfloat16,
                                 remat=True)
        s3, lv3 = step_r(state3, imgf, gt, rng)
        _force(lv3['loss'])
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            s3, lv3 = step_r(s3, imgf, gt, rng)
            _force(lv3['loss'])
            times.append(time.perf_counter() - t0)
        report['full_step_remat_ms'] = round(float(np.median(times)) * 1e3, 1)
        _emit(report)
    except Exception as e:
        report['remat_err'] = repr(e)[:120]

    del grads, state2
    try:
        del s3, state3, lv3
    except NameError:
        pass
    del newstate, lv, state
    # -- batch sweep -------------------------------------------------------
    if args.sweep_batch:
        for b in (8, 16, 24):
            im = jnp.asarray(np.random.RandomState(1).rand(b, 512, 512, 3),
                             jnp.float32)
            g = jnp.asarray((np.asarray(im).mean(-1) > 0.5).astype(np.int32))
            st = TrainState.create(_fresh_vars(), tx)
            stp = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
            try:
                st, l = stp(st, im, g, rng)
                _force(l['loss'])
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    st, l = stp(st, im, g, rng)
                    _force(l['loss'])
                    times.append(time.perf_counter() - t0)
                ms = float(np.median(times)) * 1e3
                report[f'step_b{b}_ms'] = round(ms, 1)
                report[f'step_b{b}_img_s'] = round(b / (ms / 1e3), 2)
            except Exception as e:
                report[f'b{b}_err'] = repr(e)[:120]
            _emit(report)
            del st, stp
            try:
                del l
            except NameError:
                pass

    if args.trace:
        import os
        os.makedirs('/tmp/train_trace', exist_ok=True)
        # the timing sections freed their states (HBM headroom for the
        # sweep) — build a fresh one for the traced steps
        tstate = TrainState.create(_fresh_vars(), tx)
        tstate, tlv = step(tstate, imgf, gt, rng)
        _force(tlv['loss'])
        with jax.profiler.trace('/tmp/train_trace'):
            for _ in range(3):
                tstate, tlv = step(tstate, imgf, gt, rng)
            _force(tlv['loss'])
        report['trace'] = '/tmp/train_trace'

    report['batch'] = B
    report['img_per_sec'] = round(B / (report['full_step_ms'] / 1e3), 2)
    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
