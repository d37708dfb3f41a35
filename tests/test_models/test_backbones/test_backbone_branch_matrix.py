"""Cfg-branch matrix over the stock zoo backbones (≙ the reference's
per-backbone test files under ``tests/test_models/test_backbones/``):
each case flips a real config branch, asserting pyramid shape contracts
and finite outputs at tiny widths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models import build_backbone


def _run(cfg, shape=(1, 32, 32, 3)):
    bb = build_backbone(cfg)
    x = np.random.RandomState(0).rand(*shape).astype(np.float32)
    variables = bb.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, x)
    outs = bb.apply(variables, x)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    for o in outs:
        f = o[0] if isinstance(o, (list, tuple)) else o
        assert np.isfinite(np.asarray(f)).all()
    return outs


def test_resnet_deep_stem_avg_down():
    outs = _run(dict(type='ResNet', depth=50, deep_stem=True, avg_down=True,
                     stem_channels=8, base_channels=8, out_indices=(0, 3)))
    assert outs[0].shape[-1] == 32  # expansion 4 * base 8
    assert outs[1].shape[1] == 1    # stride 32 from 32px


def test_resnet_contract_dilation_and_multigrid():
    outs = _run(dict(type='ResNet', depth=50, dilations=(1, 1, 2, 4),
                     strides=(1, 2, 1, 1), contract_dilation=True,
                     stem_channels=8, base_channels=8, out_indices=(3,)))
    assert outs[0].shape[1] == 4  # os8 on 32px
    outs = _run(dict(type='ResNet', depth=50, dilations=(1, 1, 1, 2),
                     strides=(1, 2, 2, 1), multi_grid=(1, 2, 4),
                     stem_channels=8, base_channels=8, out_indices=(3,)))
    assert outs[0].shape[1] == 2  # os16 on 32px (strides 1,2,2,1 from /4 stem)


def test_vit_cls_token_branches():
    base = dict(type='VisionTransformer', img_size=32, patch_size=8,
                embed_dims=8, num_layers=2, num_heads=2, out_indices=(0, 1))
    outs = _run(dict(base, with_cls_token=True, output_cls_token=False))
    assert outs[0].shape == (1, 4, 4, 8)
    # output_cls_token=True yields (feat, cls) tuples — the DPT contract
    outs = _run(dict(base, with_cls_token=True, output_cls_token=True))
    feat, cls = outs[0]
    assert feat.shape == (1, 4, 4, 8) and cls.shape == (1, 8)
    outs = _run(dict(base, with_cls_token=False))
    assert outs[0].shape == (1, 4, 4, 8)


def test_vit_final_norm_changes_last_output():
    base = dict(type='VisionTransformer', img_size=32, patch_size=8,
                embed_dims=8, num_layers=2, num_heads=2, out_indices=(1,))
    a = np.asarray(_run(dict(base, final_norm=False))[0])
    b = np.asarray(_run(dict(base, final_norm=True))[0])
    assert not np.allclose(a, b)


def test_unet_strides_dilations():
    outs = _run(dict(type='UNet', base_channels=4, num_stages=4,
                     strides=(1, 1, 2, 2), enc_num_convs=(2, 2, 2, 2),
                     dec_num_convs=(2, 2, 2), downsamples=(True, True, False),
                     enc_dilations=(1, 1, 1, 1), dec_dilations=(1, 1, 1),
                     norm_cfg=dict(type='BN')))
    assert len(outs) == 4
    assert outs[-1].shape == (1, 32, 32, 4)


def test_mit_sr_ratios_and_heads():
    outs = _run(dict(type='MixVisionTransformer', embed_dims=8,
                     num_layers=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                     sr_ratios=(4, 2, 1, 1)), (1, 64, 64, 3))
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]


def test_swin_absolute_pos_embed():
    outs = _run(dict(type='SwinTransformer', embed_dims=8, depths=(1, 1),
                     num_heads=(1, 2), window_size=4, use_abs_pos_embed=True,
                     out_indices=(0, 1)))
    assert outs[0].shape == (1, 8, 8, 8)


def test_hrnet_tiny_arch_branch():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(4, 8)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1), num_channels=(4, 8, 16, 32)))
    outs = _run(dict(type='HRNet', extra=extra, norm_cfg=dict(type='BN')))
    assert [o.shape[-1] for o in outs] == [4, 8, 16, 32]


def test_convnext_gap_before_final_norm():
    for gap in (True, False):
        outs = _run(dict(type='ConvNeXt', arch='tiny', out_indices=(0, 3),
                         gap_before_final_norm=gap), (1, 64, 64, 3))
        assert len(outs) == 2


def test_mobilenet_v2_widen_factor():
    outs = _run(dict(type='MobileNetV2', widen_factor=0.5,
                     out_indices=(4,)), (1, 32, 32, 3))
    assert outs[0].shape[-1] == 48  # 96 * 0.5


def test_beit_rel_pos_bias():
    outs = _run(dict(type='BEiT', img_size=32, patch_size=8, embed_dims=8,
                     num_layers=2, num_heads=2, out_indices=(1,)))
    assert outs[0].shape == (1, 4, 4, 8)
