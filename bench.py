"""Benchmark: STC-UNet 512x512 throughput per chip (slide + whole + train).

Protocol mirrors the reference's ``tools/benchmark.py`` (warmup-skip timing
loop, ``tools/benchmark.py:54-120``) on the driver's headline metric
(BASELINE.json): 512-squared KiTS19-style slices per second per chip under
slide inference (crop 256, stride 170 — the stock UNet test_cfg,
``configs/_base_/models/fcn_unet_s5-d16.py:51``), bf16 activations
(TPU-native mixed precision ≙ the reference's auto_fp16).

Also reported (extra keys on the same JSON line, driver-visible):
- ``whole_slices_per_sec``: whole-image mode — the author's own test_cfg
  (``my_config/STC-UNet.py`` runs mode='whole').
- ``train_img_per_sec``: full pjit train step (fwd+loss+grad+update+BN sync).
- ``p50_latency_ms``: bs=1 whole-mode per-call latency (BASELINE.json names
  p50 latency as a target metric).

Baseline: the fork publishes no numbers; the closest published figure is
327.87 ms/im for FCN-UNet-S5-D16 at 512x1024 fp32 bs1 on V100
(``configs/unet/unet.yml:27-28``) → ~163.9 ms per 512x512 slice →
6.10 slices/sec. vs_baseline is measured against that.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SLICES_PER_SEC = 6.10  # V100 fp32, see module docstring
BATCH = 14        # slide-mode sweet spot on v5e (see ROUND_NOTES)
WHOLE_BATCH = 8   # whole-mode sweet spot
TRAIN_BATCH = 8  # sharp optimum: conv batch dim pads to 8 sublanes — B=4/6
                 # waste half the padding, B=10 pads to 16 (round-3 sweep)
WARMUP = 2
ITERS = 10

# timing must force a host readback: on the tunneled TPU platform
# block_until_ready has been observed to return early, so each timed
# segment ends with a scalar device→host transfer that cannot complete
# before the computation does.


def _throughput(fn, *args, iters=ITERS):
    for _ in range(WARMUP):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)              # queue asynchronously
    float(fn(*args))           # readback bounds the whole queue
    return iters / (time.perf_counter() - t0)


def _p50_latency_ms(fn, *args, iters=20):
    for _ in range(WARMUP):
        float(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(times, 50))


def main():
    from __graft_entry__ import _flagship_cfg
    from stc_unet_tpu.models import build_segmentor

    cfg = _flagship_cfg()
    cfg['test_cfg'] = dict(mode='slide', crop_size=(256, 256),
                           stride=(170, 170))
    model = build_segmentor(cfg)
    model.init_weights(seed=0, input_size=(64, 64))
    variables = jax.tree_util.tree_map(jnp.asarray, model.variables)
    model.variables = variables

    img = np.random.RandomState(0).rand(BATCH, 512, 512, 3)
    img = jnp.asarray(img, jnp.bfloat16)

    # -- slide mode (headline) ------------------------------------------
    offsets, crop = model._slide_offsets(512, 512)
    slide_fn = model._jit_slide(tuple(img.shape), offsets, crop)

    @jax.jit
    def slide_sum(variables, img):
        return jnp.sum(slide_fn(variables, img).astype(jnp.float32))

    slide_rate = _throughput(slide_sum, variables, img) * BATCH

    extras = {}

    # -- whole mode (the author's own test_cfg) --------------------------
    try:
        net = model.net

        @jax.jit
        def whole_sum(variables, img):
            out = net.apply(variables, img, train=False)
            return jnp.sum(out.astype(jnp.float32))

        wimg = img[:WHOLE_BATCH]
        extras['whole_slices_per_sec'] = round(
            _throughput(whole_sum, variables, wimg) * WHOLE_BATCH, 2)
        extras['p50_latency_ms'] = round(
            _p50_latency_ms(whole_sum, variables, img[:1]), 2)
    except Exception as e:  # pragma: no cover - keep the headline alive
        extras['whole_error'] = repr(e)[:200]

    # -- train step -------------------------------------------------------
    try:
        from stc_unet_tpu.core import build_lr_schedule, build_optimizer_tx
        from stc_unet_tpu.engine import TrainState, make_train_step
        schedule = build_lr_schedule(
            dict(policy='poly', power=0.9, min_lr=1e-6, by_epoch=False),
            base_lr=1e-5, max_iters=1000)
        tx = build_optimizer_tx(
            dict(type='Adam', lr=1e-5, betas=(0.9, 0.999)),
            schedule=schedule)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, compute_dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        # device-put once: re-uploading 12MB/step over the tunneled chip
        # would dominate the measurement (host→device is not the metric)
        timg = jnp.asarray(np.asarray(img[:TRAIN_BATCH], np.float32))
        gt = jnp.asarray((np.asarray(timg).mean(-1) > 0.5).astype(np.int32))

        state, lv = step(state, timg, gt, rng)  # compile
        float(lv['loss'])
        state, lv = step(state, timg, gt, rng)  # settle
        float(lv['loss'])
        # amortized readback (same protocol as _throughput): queue the
        # steps asynchronously, bound the whole queue with one readback —
        # per-call readback costs ~36 ms over the tunnel and is not the
        # metric
        iters = 12
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            state, log_vars = step(state, timg, gt, rng)
        state, log_vars = step(state, timg, gt, rng)
        float(log_vars['loss'])
        dt = (time.perf_counter() - t0) / iters
        extras['train_img_per_sec'] = round(TRAIN_BATCH / dt, 2)
    except Exception as e:  # pragma: no cover
        extras['train_error'] = repr(e)[:200]

    print(json.dumps({
        'metric': 'stc_unet_512x512_slide_inference_throughput',
        'value': round(slide_rate, 2),
        'unit': 'slices/sec/chip',
        'vs_baseline': round(slide_rate / BASELINE_SLICES_PER_SEC, 2),
        **extras,
    }))


if __name__ == '__main__':
    main()
