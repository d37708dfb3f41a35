"""Probe: KSA gate-backward variants at STC train shapes (real chip).

The train-step ablation (docs/data/train_ablation_b8.json) shows KSA's
backward at 2.47x its forward (93.9 ms vs 38 ms at B=8 512^2) while the
plain-conv floor is 1.43x; the standalone bwd-conv probe showed bwd
convs are FASTER per-FLOP than fwd, so the overhead must live in the
non-conv parts. Prime suspect: the gate application

    out += att[i][:, None, None, :].astype(bf16) * h_i

whose VJP w.r.t. att is a (H, W) reduction over the bf16 branch map —
the bf16-native reduction path measured ~10x slower than a fused
convert+reduce (docs/perf_analysis.md).

Variants (full KSA block fwd+bwd, stage-1 geometry 8x512^2x64 and
stage-3 64^2... actually stage-2 256^2x128 and stage-3 128^2x256):

  shipped    — current KernelSelectAttention as in unet_backbone.py
  f32gate    — gate multiply done in f32 (h cast up, product cast back):
               autodiff then emits convert+reduce instead of bf16-reduce
  customvjp  — hand-written VJP for the weighted sum: d_att via
               jnp.sum((dout * h).astype(f32)) fused convert+reduce,
               d_h = att * dout (elementwise); fwd byte-identical

Usage: python tools/probe_ksa_bwd.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        _ = float(jnp.sum(
            jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args)
    out = fn(*args)
    _ = float(jnp.sum(
        jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[:1]))
    return (time.perf_counter() - t0) / iters * 1e3


@jax.custom_vjp
def _gated_sum(att, hs):
    """att (k, N, C) f32, hs (k, N, H, W, C) bf16 -> (N, H, W, C) bf16."""
    out = 0.
    for i in range(att.shape[0]):
        out = out + att[i][:, None, None, :].astype(hs.dtype) * hs[i]
    return out


def _gated_sum_fwd(att, hs):
    return _gated_sum(att, hs), (att, hs)


def _gated_sum_bwd(res, dout):
    att, hs = res
    d32 = dout.astype(jnp.float32)
    # fused convert+reduce per branch: (N, H, W, C) -> (N, C) in f32
    datt = jnp.stack([
        jnp.sum(d32 * hs[i].astype(jnp.float32), axis=(1, 2))
        for i in range(att.shape[0])], axis=0)
    dhs = att[:, :, None, None, :].astype(hs.dtype) * dout[None]
    return datt, dhs


_gated_sum.defvjp(_gated_sum_fwd, _gated_sum_bwd)


def ksa(x, ws, mode, kernels=(3, 5, 7)):
    """Functional KSA core (convs + BN folded out: conv+relu only, enough
    to exercise the gate path; BN is cheap per the ablation)."""
    c = x.shape[-1]
    d = max(32, c // 16)
    conv_outs = []
    for i, k in enumerate(kernels):
        # Mirror the shipped Conv2d brick: flax nn.Conv(dtype=x.dtype,
        # param_dtype=f32) casts the kernel to bf16 and runs the conv fully
        # in bf16 (no preferred_element_type → grads stay single-dtype).
        h = jax.lax.conv_general_dilated(
            x, ws[f'conv{i}'].astype(x.dtype), (1, 1),
            [(k // 2, k // 2)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        conv_outs.append(jax.nn.relu(h))
    S = sum(jnp.mean(h.astype(jnp.float32), axis=(1, 2)) for h in conv_outs)
    Z = S @ ws['fc']                                        # (N, d)
    weights = [Z @ ws[f'fcs{i}'] for i in range(len(kernels))]
    att = jax.nn.softmax(jnp.stack(weights, axis=0), axis=0)  # (k, N, C)

    if mode == 'shipped':
        out = 0.
        for i, h in enumerate(conv_outs):
            out = out + att[i][:, None, None, :].astype(h.dtype) * h
        return out
    if mode == 'f32gate':
        out = 0.
        for i, h in enumerate(conv_outs):
            out = out + att[i][:, None, None, :] * h.astype(jnp.float32)
        return out.astype(x.dtype)
    if mode == 'customvjp':
        return _gated_sum(att, jnp.stack(conv_outs, axis=0))
    raise ValueError(mode)


def run(n, hw, c, modes):
    rng = np.random.RandomState(0)
    d = max(32, c // 16)
    x = jnp.asarray(rng.randn(n, hw, hw, c) * 0.1, jnp.bfloat16)
    ws = {}
    for i, k in enumerate((3, 5, 7)):
        ws[f'conv{i}'] = jnp.asarray(
            rng.randn(k, k, c, c) * (1.0 / np.sqrt(k * k * c)), jnp.float32)
        ws[f'fcs{i}'] = jnp.asarray(rng.randn(d, c) * 0.1, jnp.float32)
    ws['fc'] = jnp.asarray(rng.randn(c, d) * 0.1, jnp.float32)

    results = {}
    ref = None
    for mode in modes:
        core = functools.partial(ksa, mode=mode)
        fwd = jax.jit(lambda x, ws: core(x, ws))

        def loss(x, ws):
            return jnp.sum(core(x, ws).astype(jnp.float32) ** 2)

        vg = jax.jit(jax.grad(loss, argnums=(0, 1)))
        try:
            fwd_ms = _time(fwd, x, ws)
            vg_ms = _time(vg, x, ws)
            gx, _ = vg(x, ws)
            gx = np.asarray(gx, np.float32)
            if ref is None:
                ref = gx
            results[mode] = dict(
                fwd_ms=round(fwd_ms, 2), fwd_plus_bwd_ms=round(vg_ms, 2),
                bwd_ms=round(vg_ms - fwd_ms, 2),
                bwd_over_fwd=round((vg_ms - fwd_ms) / fwd_ms, 2),
                max_dx_err=float(np.max(np.abs(gx - ref))))
        except Exception as e:  # noqa: BLE001 — probe keeps going
            results[mode] = dict(error=f'{type(e).__name__}: {e}'[:200])
        print('PARTIAL', mode, json.dumps(results[mode]), flush=True)
    return results


def main():
    modes = ['shipped', 'f32gate', 'customvjp']
    out = {}
    out['s1_c64_512'] = run(8, 512, 64, modes)
    out['s2_c128_256'] = run(8, 256, 128, modes)
    out['s3_c256_128'] = run(8, 128, 256, modes)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    sys.exit(main())
