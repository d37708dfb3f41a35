"""Fused windowed multi-head attention (Pallas/TPU) for MaxViT-style
blocks (reference ``backbones/maxvit_encoder.py:244`` RelativeSelfAttention).

Why a kernel. MaxViT fixes ``num_heads=32`` (``my_config/MaxViT-UNet.py:14``),
so head_dim = C/32 is 2..16 — the per-head score/apply einsums contract over
almost nothing and XLA lowers them as HBM-materialised batched matmuls: at
the 512^2/B=8 stage-0 geometry the (2048, 32, 64, 64) score tensor is 0.5 GB
and is written/read several times per layer (fwd ~1.5 GB, bwd ~4 GB of pure
attention-matrix traffic). The measured result (docs/data/maxvit_bwd_probe
.json) is ~1 TFLOP/s on a 200 TFLOP/s chip. This kernel keeps the score
matrices in VMEM for both passes; HBM traffic collapses to q/k/v/out.

How the tiny heads ride the MXU. For one window let q,k,v be (N, C) with
C = H*D packed head-major. Tile k H times into rows j=(h,m) -> K~ (H*N, C),
and zero it with the block mask B[j, c] = [j//N == c//D]. Then one matmul

    S = q @ (B * K~)^T        # (N, H*N);  S[n, (h, m)] = q_h[n] . k_h[m]

computes every head's scores exactly (the mask kills cross-head terms), and
the apply is its mirror image ``out = A @ (B * V~)`` which lands directly in
the packed (N, C) layout. Softmax is segmented per head along the H*N axis:
a global row-max is a valid stabiliser for every segment, the per-segment
denominator is one matmul with the block-ones matrix M[j, h] = [j//N == h],
and its broadcast back to (N, H*N) is a matmul with M^T. Everything is an
MXU op; the H-times-redundant FLOPs are ~32x cheaper than the HBM round
trips they replace.

Attention dropout runs inside the kernel with the TPU-native PRNG
(``pltpu.prng_seed`` / ``prng_random_bits``), seeded per grid step from a
scalar seed — the backward kernel reseeds identically, so the recomputed
mask matches bit-for-bit and nothing is stored.

The custom VJP recomputes scores/softmax in VMEM (flash-attention style);
residuals are only (q, k, v, bias) — with 0.5 GB/layer of saved score
matrices gone, the B=8 train step fits without rematerialisation.

CPU/testing: ``interpret=True`` runs the same kernel under the Pallas
interpreter (tests/test_ops/test_window_attention.py checks fwd+grad parity
against the reference einsum formulation).
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['window_attention', 'window_attention_reference',
           'fused_attention_enabled']


def fused_attention_enabled() -> bool:
    """Policy for the model layer: use the fused kernel on a single TPU
    device (pallas_call is not auto-partitionable by the SPMD partitioner,
    so multi-device pjit programs keep the einsum path). Override with
    STC_UNET_TPU_FUSED_ATTN=on/off."""
    mode = os.environ.get('STC_UNET_TPU_FUSED_ATTN', 'auto')
    if mode in ('0', 'off'):
        return False
    if mode in ('1', 'on'):
        return True
    return jax.default_backend() == 'tpu' and jax.device_count() == 1


# ---------------------------------------------------------------------------
# static helper tensors
# ---------------------------------------------------------------------------
@lru_cache(maxsize=None)
def _masks(heads: int, n: int, c: int):
    """Block mask B (H*N, C), block-ones M (H*N, H) and M^T (H, H*N)."""
    d = c // heads
    j = np.arange(heads * n)
    B = (j[:, None] // n == np.arange(c)[None, :] // d)
    M = (j[:, None] // n == np.arange(heads)[None, :])
    return (B.astype(np.float32), M.astype(np.float32),
            M.T.copy().astype(np.float32))


def _pick_wb(w: int, n: int, c: int, heads: int) -> int:
    """Windows per grid step: largest power of two dividing W whose VMEM
    footprint (score-sized f32 temporaries + tiled K/V, the dominant
    live set of the bwd kernel) fits the v5e's VMEM with headroom. Small
    blocks leave the grid launch-bound (2048 one-window steps measured
    ~2.4x slower than 16-window blocks at the 512^2 stage-0 geometry)."""
    hn = heads * n
    for wb in (32, 16, 8, 4, 2, 1):
        if w % wb:
            continue
        bytes_per = wb * (n * hn * 4 * 4 + 2 * hn * c * 2)
        if bytes_per < 48 * 2 ** 20:
            return wb
    return 1


def _tile_rows(x, heads: int):
    """(WB, N, C) -> (WB, H*N, C): rows repeated head-major (j = h*N + m)."""
    wb, n, c = x.shape
    return jnp.broadcast_to(x[:, None], (wb, heads, n, c)).reshape(
        wb, heads * n, c)


def _bmm(a, b, preferred=jnp.float32):
    """Batched matmul over leading dim: (W,N,K) @ (W,M,K)^T -> (W,N,M)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=preferred)


def _seed_step(seed_ref):
    """Seed the per-core PRNG uniquely per grid step (same seeding in the
    fwd and bwd kernels -> identical dropout masks without storing them)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))


def _drop_mult(shape, rate: float, dtype):
    """Inverted-dropout multiplier from the in-kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)
    keep_prob = 1.0 - rate
    thresh = np.uint32(min(int(keep_prob * 2 ** 32), 2 ** 32 - 1))
    keep = pltpu.bitcast(bits, jnp.uint32) < thresh
    return keep.astype(dtype) * dtype(1.0 / keep_prob)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _attn_core(q_ref, k_ref, bias_ref, B_ref, M_ref, MT_ref, scale):
    """Shared fwd recompute: returns (attn f32, K~ bf16-ish, denom-recip)."""
    dt = q_ref.dtype
    q = q_ref[:] * dt.type(scale)
    kk = _tile_rows(k_ref[:], B_ref.shape[0] // q_ref.shape[1]) * \
        B_ref[:].astype(dt)
    s = _bmm(q, kk)                                   # (WB, N, HN) f32
    s = s + bias_ref[:][None]
    gmax = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - gmax)
    denom = jax.lax.dot_general(
        e, M_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (WB, N, H)
    rec = 1.0 / denom
    expand = jax.lax.dot_general(
        rec, MT_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (WB, N, HN)
    return e * expand, kk, q


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, B_ref, M_ref,
                MT_ref, o_ref, *, scale: float, heads: int, rate: float):
    if rate > 0.0:
        _seed_step(seed_ref)
    attn, _, _ = _attn_core(q_ref, k_ref, bias_ref, B_ref, M_ref, MT_ref,
                            scale)
    dt = q_ref.dtype
    attn = attn.astype(dt)
    if rate > 0.0:
        attn = attn * _drop_mult(attn.shape, rate, dt.type)
    vv = _tile_rows(v_ref[:], heads) * B_ref[:].astype(dt)
    out = jax.lax.dot_general(
        attn, vv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(dt)


def _collapse(dxx, B_ref, heads: int):
    """(WB, H*N, C) tiled-gradient -> (WB, N, C): masked sum over the
    head-tile axis (the fwd tiling's transpose)."""
    wb, hn, c = dxx.shape
    n = hn // heads
    masked = dxx * B_ref[:].astype(dxx.dtype)
    return jnp.sum(masked.reshape(wb, heads, n, c), axis=1)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, B_ref, M_ref,
                MT_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, heads: int, rate: float):
    if rate > 0.0:
        _seed_step(seed_ref)
    attn, kk, q = _attn_core(q_ref, k_ref, bias_ref, B_ref, M_ref, MT_ref,
                             scale)
    dt = q_ref.dtype
    attn_bf = attn.astype(dt)
    if rate > 0.0:
        mult = _drop_mult(attn_bf.shape, rate, dt.type)
        attn_used = attn_bf * mult
    else:
        attn_used = attn_bf
    do = do_ref[:]
    vv = _tile_rows(v_ref[:], heads) * B_ref[:].astype(dt)
    # out = attn_used @ vv
    dvv = jax.lax.dot_general(                        # (WB, HN, C)
        attn_used, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)
    dv_ref[:] = _collapse(dvv, B_ref, heads).astype(dt)
    dattn = _bmm(do, vv)                              # (WB, N, HN) f32
    if rate > 0.0:
        dattn = dattn * mult.astype(jnp.float32)
    # segmented softmax VJP: ds = t - attn * expand(sum_seg t), t = dattn*a
    t = dattn * attn
    rowseg = jax.lax.dot_general(
        t, M_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (WB, N, H)
    ds = t - attn * jax.lax.dot_general(
        rowseg, MT_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    @pl.when(pl.program_id(0) == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
    dbias_ref[:] += jnp.sum(ds, axis=0)
    ds_bf = ds.astype(dt)
    dq = jax.lax.dot_general(                         # (WB, N, C)
        ds_bf, kk, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[:] = (dq * scale).astype(dt)
    dkk = jax.lax.dot_general(                        # (WB, HN, C)
        ds_bf, q,  # q from _attn_core already carries the scale
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)
    dk_ref[:] = _collapse(dkk, B_ref, heads).astype(dt)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------
# v5e carries 128 MB of VMEM; the compiler's default 16 MB scoped limit
# rejects the multi-window blocks that amortise grid-step overhead.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def _specs(w, wb, n, c, heads):
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    hn = heads * n
    blk = pl.BlockSpec((wb, n, c), lambda i, s: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    const2 = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM)
    return blk, const2((n, hn)), const2((hn, c)), const2((hn, heads)), \
        const2((heads, hn))


def _call_fwd(q, k, v, bias_e, seed, scale, heads, rate, interpret):
    w, n, c = q.shape
    wb = _pick_wb(w, n, c, heads)
    Bm, Mm, MTm = _masks(heads, n, c)
    blk, sb, sB, sM, sMT = _specs(w, wb, n, c, heads)
    kern = partial(_fwd_kernel, scale=scale, heads=heads, rate=rate)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // wb,),
            in_specs=[blk, blk, blk, sb, sB, sM, sMT],
            out_specs=blk),
        out_shape=jax.ShapeDtypeStruct((w, n, c), q.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, q, k, v, bias_e, jnp.asarray(Bm), jnp.asarray(Mm),
      jnp.asarray(MTm))


def _call_bwd(q, k, v, bias_e, seed, do, scale, heads, rate, interpret):
    w, n, c = q.shape
    hn = heads * n
    wb = _pick_wb(w, n, c, heads)
    Bm, Mm, MTm = _masks(heads, n, c)
    blk, sb, sB, sM, sMT = _specs(w, wb, n, c, heads)
    kern = partial(_bwd_kernel, scale=scale, heads=heads, rate=rate)
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(w // wb,),
            in_specs=[blk, blk, blk, sb, sB, sM, sMT, blk],
            out_specs=(blk, blk, blk,
                       pl.BlockSpec((n, hn), lambda i, s: (0, 0),
                                    memory_space=pltpu.VMEM))),
        out_shape=(jax.ShapeDtypeStruct((w, n, c), q.dtype),
                   jax.ShapeDtypeStruct((w, n, c), q.dtype),
                   jax.ShapeDtypeStruct((w, n, c), q.dtype),
                   jax.ShapeDtypeStruct((n, hn), jnp.float32)),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(seed, q, k, v, bias_e, jnp.asarray(Bm), jnp.asarray(Mm),
      jnp.asarray(MTm), do)
    return dq, dk, dv, dbias


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def window_attention(q, k, v, bias_e, seed, heads: int, scale: float,
                     rate: float = 0.0, interpret: bool = False):
    """out[w] = concat_h softmax(q_h k_h^T * scale + bias_h) v_h.

    q/k/v: (W, N, C) packed head-major (C = heads * head_dim).
    bias_e: (N, heads*N) f32 — per-head bias laid out head-major along the
    last axis (``bias.transpose(1, 0, 2).reshape(N, H*N)`` of an (H, N, N)
    table).
    seed: (1,) int32 — attention-dropout seed (ignored when rate == 0).
    """
    return _call_fwd(q, k, v, bias_e, seed, scale, heads, rate, interpret)


def _wa_fwd(q, k, v, bias_e, seed, heads, scale, rate, interpret):
    out = _call_fwd(q, k, v, bias_e, seed, scale, heads, rate, interpret)
    return out, (q, k, v, bias_e, seed)


def _wa_bwd(heads, scale, rate, interpret, res, do):
    q, k, v, bias_e, seed = res
    dq, dk, dv, dbias = _call_bwd(q, k, v, bias_e, seed, do, scale, heads,
                                  rate, interpret)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias.astype(bias_e.dtype), dseed


window_attention.defvjp(_wa_fwd, _wa_bwd)


def window_attention_reference(q, k, v, bias, heads: int, scale: float):
    """Plain-XLA reference (the einsum formulation) for parity tests.
    bias: (H, N, N)."""
    w, n, c = q.shape
    d = c // heads
    def split(x):
        return x.reshape(w, n, heads, d).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q) * scale, split(k), split(v)
    s = jnp.einsum('whnd,whmd->whnm', qh, kh) + bias[None]
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum('whnm,whmd->whnd', a, vh)
    return o.transpose(0, 2, 1, 3).reshape(w, n, c)
