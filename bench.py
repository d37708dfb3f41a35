"""Benchmark: STC-UNet 512x512 slide-inference throughput per chip.

Protocol mirrors the reference's ``tools/benchmark.py`` (warmup-skip timing
loop, ``tools/benchmark.py:54-120``) on the driver's headline metric
(BASELINE.json): 512-squared KiTS19-style slices per second per chip under
slide inference (crop 256, stride 170 — the stock UNet test_cfg,
``configs/_base_/models/fcn_unet_s5-d16.py:51``), bf16 activations
(TPU-native mixed precision ≙ the reference's auto_fp16).

Baseline: the fork publishes no numbers; the closest published figure is
327.87 ms/im for FCN-UNet-S5-D16 at 512x1024 fp32 bs1 on V100
(``configs/unet/unet.yml:27-28``) → ~163.9 ms per 512x512 slice →
6.10 slices/sec. vs_baseline is measured against that.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SLICES_PER_SEC = 6.10  # V100 fp32, see module docstring
BATCH = 14  # measured sweet spot on v5e (see ROUND_NOTES)
WARMUP = 2
ITERS = 10


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

    offsets, crop = model._slide_offsets(512, 512)
    slide_fn = model._jit_slide(tuple(img.shape), offsets, crop)

    # timing must force a host readback: on the tunneled TPU platform
    # block_until_ready has been observed to return early, so each timed
    # segment ends with a scalar device→host transfer that cannot complete
    # before the computation does.
    @jax.jit
    def fn(variables, img):
        return jnp.sum(slide_fn(variables, img).astype(jnp.float32))

    for _ in range(WARMUP):
        float(fn(variables, img))

    t0 = time.perf_counter()
    for _ in range(ITERS - 1):
        out = fn(variables, img)  # queue asynchronously
    float(fn(variables, img))     # readback bounds the whole queue
    dt = time.perf_counter() - t0

    slices_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        'metric': 'stc_unet_512x512_slide_inference_throughput',
        'value': round(slices_per_sec, 2),
        'unit': 'slices/sec/chip',
        'vs_baseline': round(slices_per_sec / BASELINE_SLICES_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
