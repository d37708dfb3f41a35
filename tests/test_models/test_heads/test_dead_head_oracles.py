"""Golden numerics for the quirkiest dead-head blocks vs torch oracles:
the reference HANC cat-over-H + view channel interleave, SoftPooling2D,
and the lp/softpool channel-gate pools (EIU scale attention)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F


def test_hanc_channel_interleave_matches_torch_view_trick():
    """reference acc_head.py HANCLayer k=2: cat over H then view must equal
    our stack+reshape channel ordering."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)  # NCHW
    tx = torch.from_numpy(x)
    up = torch.nn.Upsample(scale_factor=2)
    blocks = [tx, up(torch.nn.AvgPool2d(2)(tx)), up(torch.nn.MaxPool2d(2)(tx))]
    ref = torch.concat(blocks, dim=2).view(2, 4 * 3, 8, 8).numpy()

    from stc_unet_tpu.models.decode_heads.acc_head import _up_nearest
    from stc_unet_tpu.models.bricks import avg_pool2d, max_pool2d
    jx = jnp.asarray(x.transpose(0, 2, 3, 1))  # NHWC
    jblocks = [jx, _up_nearest(avg_pool2d(jx, 2), 2),
               _up_nearest(max_pool2d(jx, 2), 2)]
    ours = jnp.stack(jblocks, axis=-1).reshape(2, 8, 8, 12)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-6)


def test_soft_pooling_matches_torch_formula():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    tx = torch.from_numpy(x)
    avg = torch.nn.AvgPool2d(2, 2)
    e = torch.exp(tx)
    ref = (avg(e * tx) / avg(e)).numpy()

    from stc_unet_tpu.models.decode_heads.eiunet_head import _soft_pool2
    ours = np.asarray(_soft_pool2(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-5,
                               atol=1e-6)


def test_lp_and_softpool_channel_gate_pools():
    """EIU scale-attention gate pools: lp_pool2d(p=2, full map) and
    full-map softpool vs torch."""
    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 6, 6).astype(np.float32)
    tx = torch.from_numpy(x)
    ref_lp = F.lp_pool2d(tx, 2, (6, 6), stride=(6, 6)).reshape(2, 16).numpy()
    e = torch.exp(tx)
    avgp = torch.nn.AvgPool2d((6, 6), (6, 6))
    ref_sp = (avgp(e * tx) / avgp(e)).reshape(2, 16).numpy()

    xf = jnp.asarray(x.transpose(0, 2, 3, 1), jnp.float32)
    lp = jnp.sqrt(jnp.sum(jnp.square(xf), axis=(1, 2)))
    ej = jnp.exp(xf)
    sp = jnp.sum(ej * xf, axis=(1, 2)) / jnp.sum(ej, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(lp), ref_lp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sp), ref_sp, rtol=1e-5)


def test_psa_reversed_concat_matches_torch_loop():
    """reference eiunet PSAModule output order: the loop builds
    [f3, f2, f1, f0]."""
    fs = [np.full((1, 2, 2, 2), i, np.float32) for i in range(4)]
    ours = np.asarray(jnp.concatenate(
        [jnp.asarray(f) for f in fs][::-1], axis=-1))
    t_fs = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in fs]
    out = None
    for i in range(4):
        out = t_fs[i] if i == 0 else torch.cat((t_fs[i], out), 1)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), out.numpy())
