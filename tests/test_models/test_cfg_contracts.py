"""Invalid-config contract tests (reference negative-path parity).

The reference's per-component tests assert that misconfigurations fail
at CONSTRUCTION (e.g. ``tests/test_models/test_backbones/test_resnet.py``,
``test_unet.py``, ``test_vit.py``, ``test_mobilenet_v3.py``,
``test_heads/test_decode_head.py``). flax modules would otherwise defer
everything to first init — or worse, silently truncate stages / ignore a
bad style — so the ports add ``__post_init__`` validation mirroring the
reference's asserts. This file pins those contracts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stc_unet_tpu.models import BACKBONES, HEADS


def build(reg, name, **kw):
    return reg.get(name)(**kw)


# -- ResNet family ---------------------------------------------------------

def test_resnet_contracts():
    with pytest.raises(KeyError):
        build(BACKBONES, 'ResNet', depth=17)          # unknown depth
    with pytest.raises(AssertionError):
        build(BACKBONES, 'ResNet', depth=18, num_stages=5)
    with pytest.raises(AssertionError):               # len mismatch
        build(BACKBONES, 'ResNet', depth=18, strides=(1,),
              dilations=(1, 1), num_stages=3)
    with pytest.raises(AssertionError):               # unknown style
        build(BACKBONES, 'ResNet', depth=50, style='tensorflow')
    with pytest.raises(TypeError):                    # pretrained type
        build(BACKBONES, 'ResNet', depth=50, pretrained=0)
    # subclasses inherit the contract
    with pytest.raises(KeyError):
        build(BACKBONES, 'ResNetV1c', depth=17)
    # valid cfgs still construct
    build(BACKBONES, 'ResNet', depth=18)
    build(BACKBONES, 'ResNetV1d', depth=50)


# -- stock UNet ------------------------------------------------------------

def test_unet_length_contracts():
    base = dict(in_channels=3, base_channels=4)
    with pytest.raises(AssertionError):   # len(strides) != num_stages
        build(BACKBONES, 'UNet', num_stages=5, strides=(1, 1, 1, 1),
              **base)
    with pytest.raises(AssertionError):   # len(enc_num_convs) != num_stages
        build(BACKBONES, 'UNet', num_stages=5, strides=(1,) * 5,
              enc_num_convs=(2, 2, 2, 2), **base)
    with pytest.raises(AssertionError):   # len(dec_num_convs) != n-1
        build(BACKBONES, 'UNet', num_stages=5, strides=(1,) * 5,
              enc_num_convs=(2,) * 5, dec_num_convs=(2, 2, 2), **base)
    with pytest.raises(AssertionError):   # dcn unsupported
        build(BACKBONES, 'UNet', dcn=dict(type='DCN'), **base)
    with pytest.raises(AssertionError):   # plugins unsupported
        build(BACKBONES, 'UNet', plugins=[dict(cfg=dict())], **base)
    build(BACKBONES, 'UNet', **base)      # defaults valid


def test_unet_input_divisibility():
    m = build(BACKBONES, 'UNet', in_channels=3, base_channels=4)
    with pytest.raises(AssertionError):   # 65 not divisible by 16
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 65, 65, 3)),
               train=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
               train=False)
    outs = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(outs) == 5


def test_deconv_module_kernel_scale():
    from stc_unet_tpu.models.backbones.unet import DeconvModule
    for k, s in [(1, 2), (3, 2), (5, 4)]:
        with pytest.raises(AssertionError):
            DeconvModule(32, kernel_size=k, scale_factor=s)
    DeconvModule(32, kernel_size=4, scale_factor=2)   # valid


# -- MobileNetV3 -----------------------------------------------------------

def test_mobilenet_v3_contracts():
    with pytest.raises(AssertionError):
        build(BACKBONES, 'MobileNetV3', arch='big')
    with pytest.raises(AssertionError):
        build(BACKBONES, 'MobileNetV3', reduction_factor=0)
    with pytest.raises(ValueError):
        build(BACKBONES, 'MobileNetV3', out_indices=(0, 1, 15))
    with pytest.raises(ValueError):
        build(BACKBONES, 'MobileNetV3', frozen_stages=15)
    build(BACKBONES, 'MobileNetV3')                   # defaults valid


# -- ViT -------------------------------------------------------------------

def test_vit_contracts():
    with pytest.raises(TypeError):
        build(BACKBONES, 'VisionTransformer', img_size=512.0)
    with pytest.raises(TypeError):
        build(BACKBONES, 'VisionTransformer', out_indices=1.)
    with pytest.raises(AssertionError):
        build(BACKBONES, 'VisionTransformer', img_size=(224, 224, 224))
    with pytest.raises(TypeError):
        build(BACKBONES, 'VisionTransformer', pretrained=123)
    with pytest.raises(AssertionError):
        build(BACKBONES, 'VisionTransformer', with_cls_token=False,
              output_cls_token=True)
    build(BACKBONES, 'VisionTransformer', img_size=(224, 224))


# -- HRNet -----------------------------------------------------------------

def _hrnet_extra():
    return dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(4, 4), num_channels=(32, 64)),
        stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                    num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
        stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                    num_blocks=(4, 4, 4, 4),
                    num_channels=(32, 64, 128, 256)))


def test_hrnet_contracts():
    with pytest.raises(AssertionError):   # extra required
        build(BACKBONES, 'HRNet')
    extra = _hrnet_extra()
    del extra['stage4']                   # 4 stages required
    with pytest.raises(AssertionError):
        build(BACKBONES, 'HRNet', extra=extra)
    extra = _hrnet_extra()
    extra['stage4']['num_blocks'] = (4, 4, 4)   # len != num_branches
    with pytest.raises(AssertionError):
        build(BACKBONES, 'HRNet', extra=extra)
    build(BACKBONES, 'HRNet', extra=_hrnet_extra())   # valid


# -- BaseDecodeHead input contract (reference _init_inputs) ---------------

def test_decode_head_input_contracts():
    common = dict(channels=8, num_classes=2)
    with pytest.raises(AssertionError):   # unknown transform
        build(HEADS, 'FCNHead', in_channels=8, in_index=0,
              input_transform='weird', **common)
    with pytest.raises(AssertionError):   # list channels need a transform
        build(HEADS, 'FCNHead', in_channels=[8, 8], in_index=[0, 1],
              **common)
    with pytest.raises(AssertionError):   # transform needs list channels
        build(HEADS, 'FCNHead', in_channels=8, in_index=0,
              input_transform='resize_concat', **common)
    with pytest.raises(AssertionError):   # length mismatch
        build(HEADS, 'FCNHead', in_channels=[8, 8], in_index=[0],
              input_transform='resize_concat', **common)
    # valid variants still construct and run
    head = build(HEADS, 'FCNHead', in_channels=[4, 8], in_index=[0, 1],
                 input_transform='resize_concat', **common)
    feats = [np.zeros((1, 16, 16, 4), np.float32),
             np.zeros((1, 8, 8, 8), np.float32)]
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    out = head.apply(v, feats, train=False)
    assert out.shape == (1, 16, 16, 2)


# -- OHEM sampler ----------------------------------------------------------

def test_ohem_sampler_shape_contract():
    from stc_unet_tpu.core.seg import build_pixel_sampler

    class _Ctx:
        ignore_index = 255
        loss_decode_list = ()

    sampler = build_pixel_sampler(
        dict(type='OHEMPixelSampler', thresh=0.7, min_kept=10),
        context=_Ctx())
    logit = jnp.zeros((1, 45, 45, 19))
    label = jnp.zeros((1, 89, 89), jnp.int32)
    with pytest.raises(AssertionError):
        sampler.sample(logit, label)
    with pytest.raises(AssertionError):   # min_kept > 1 (reference :29)
        build_pixel_sampler(dict(type='OHEMPixelSampler', min_kept=1),
                            context=_Ctx())


# -- transformer backbones: pretrained/init_cfg contract ------------------

@pytest.mark.parametrize('name,kw', [
    ('SVT', {}),
    ('PCPVT', {}),
    ('BEiT', {}),
    ('MAE', {}),
    ('MixVisionTransformer', {}),
    ('SwinTransformer', {}),
    ('VisionTransformer', {}),
])
def test_pretrained_init_cfg_contract(name, kw):
    # full combination matrix ≙ reference test_twins.py:64-103 (same block
    # repeated for PCPVT/BEiT/MAE/MiT/ViT in their test files)
    with pytest.raises(TypeError):          # pretrained must be str/None
        build(BACKBONES, name, pretrained=123, **kw)
    with pytest.raises(AssertionError):     # not both at once
        build(BACKBONES, name, pretrained='a.ckpt',
              init_cfg=dict(type='Pretrained', checkpoint='a.ckpt'), **kw)
    with pytest.raises(AssertionError):     # both given, even if bad types
        build(BACKBONES, name, pretrained='a.ckpt', init_cfg=123, **kw)
    with pytest.raises(AssertionError):
        build(BACKBONES, name, pretrained=123,
              init_cfg=dict(type='Pretrained', checkpoint='a.ckpt'), **kw)
    with pytest.raises(AssertionError):
        build(BACKBONES, name, pretrained=123, init_cfg=123, **kw)
    with pytest.raises(TypeError):          # unsupported init_cfg type
        build(BACKBONES, name, pretrained=None, init_cfg=123, **kw)
    build(BACKBONES, name, pretrained='a.ckpt', **kw)   # alone: fine
    build(BACKBONES, name,
          init_cfg=dict(type='Pretrained', checkpoint='a.ckpt'), **kw)


@pytest.mark.parametrize('name', ['BEiT', 'MAE'])
def test_beit_mae_img_size_out_indices(name):
    # ≙ reference test_beit.py:15-25 / test_mae.py:15-25
    with pytest.raises(TypeError):
        build(BACKBONES, name, img_size=512.0)
    with pytest.raises(TypeError):
        build(BACKBONES, name, out_indices=1.)
    with pytest.raises(AssertionError):
        build(BACKBONES, name, img_size=(224, 224, 224))
    build(BACKBONES, name, img_size=(224,))
    build(BACKBONES, name, out_indices=11)   # int is normalized to [i]


# -- CGNet -----------------------------------------------------------------

def test_cgnet_contracts():
    with pytest.raises(AssertionError):
        build(BACKBONES, 'CGNet', num_channels=(32, 64, 128, 256))
    with pytest.raises(AssertionError):
        build(BACKBONES, 'CGNet', num_blocks=(3, 21, 3))
    with pytest.raises(AssertionError):
        build(BACKBONES, 'CGNet', num_blocks=2)
    build(BACKBONES, 'CGNet')


# -- head-specific contracts ----------------------------------------------

def test_setr_head_contracts():
    with pytest.raises(AssertionError):   # int in_channels (multiple_select)
        build(HEADS, 'SETRMLAHead', in_channels=8, channels=4,
              num_classes=19, in_index=1)
    with pytest.raises(AssertionError):   # channels != len*mla_channels
        build(HEADS, 'SETRMLAHead', in_channels=(8, 8, 8, 8),
              in_index=(0, 1, 2, 3), channels=8, mla_channels=4,
              num_classes=19)
    with pytest.raises(AssertionError):   # kernel_size must be 1/3
        build(HEADS, 'SETRUPHead', in_channels=4, channels=2,
              num_classes=19, kernel_size=2)
    with pytest.raises(AssertionError):   # tuple in_channels w/o transform
        build(HEADS, 'SETRUPHead', in_channels=(4, 4), in_index=(0, 1),
              channels=2, num_classes=19)
    build(HEADS, 'SETRMLAHead', in_channels=(8, 8, 8, 8),
          in_index=(0, 1, 2, 3), channels=16, mla_channels=4,
          num_classes=19)


def test_psp_uper_segformer_contracts():
    with pytest.raises(AssertionError):   # pool_scales type
        build(HEADS, 'PSPHead', in_channels=4, channels=2, num_classes=19,
              pool_scales=1)
    with pytest.raises(AssertionError):   # UPer needs list in_channels
        build(HEADS, 'UPerHead', in_channels=4, channels=2, num_classes=19)
    with pytest.raises(AssertionError):   # Segformer len mismatch
        build(HEADS, 'SegformerHead', in_channels=(1, 2, 3),
              in_index=(0, 1), channels=5, num_classes=2)
    build(HEADS, 'PSPHead', in_channels=4, channels=2, num_classes=19)


# -- BiSeNetV1 / ERFNet ----------------------------------------------------

def test_bisenetv1_contracts():
    bb = dict(type='ResNet', depth=18)
    with pytest.raises(AssertionError):   # spatial path must be 4 stages
        build(BACKBONES, 'BiSeNetV1', backbone_cfg=bb,
              spatial_channels=(16, 16, 16))
    with pytest.raises(AssertionError):   # context path must be 3 stages
        build(BACKBONES, 'BiSeNetV1', backbone_cfg=bb,
              context_channels=(16, 32, 64, 128))
    build(BACKBONES, 'BiSeNetV1', backbone_cfg=bb)


def test_erfnet_contracts():
    with pytest.raises(AssertionError):   # dec upsample = enc downsample - 1
        build(BACKBONES, 'ERFNet', enc_downsample_channels=(16, 64, 128),
              dec_upsample_channels=(128, 64, 16))
    with pytest.raises(AssertionError):   # enc stages = enc downsample - 1
        build(BACKBONES, 'ERFNet', enc_stage_non_bottlenecks=(5, 8, 10))
    with pytest.raises(AssertionError):   # dilation cycle must divide depth
        build(BACKBONES, 'ERFNet', enc_stage_non_bottlenecks=(5, 9))
    with pytest.raises(AssertionError):   # dec stages = dec channels
        build(BACKBONES, 'ERFNet', dec_stages_non_bottleneck=(2, 2, 2))
    build(BACKBONES, 'ERFNet')


# -- pretrained checkpoint loading ----------------------------------------

def test_missing_local_pretrained_raises():
    """A local pretrained path that doesn't exist raises (mmcv
    CheckpointLoader contract, reference test_mit.py:83) instead of
    silently training from random init; remote specs still skip with a
    warning (converted offline by tools/model_converters)."""
    import warnings
    from stc_unet_tpu.models import build_segmentor
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, base_channels=4,
                      pretrained='/nonexistent/x.ckpt'),
        decode_head=dict(type='FCNHead', in_channels=32, in_index=3,
                         channels=4, num_classes=2),
        test_cfg=dict(mode='whole'))
    m = build_segmentor(cfg)
    with pytest.raises(FileNotFoundError):
        m.init_weights(seed=0, input_size=(32, 32))
    cfg['backbone']['pretrained'] = 'open-mmlab://resnet18'
    m = build_segmentor(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        m.init_weights(seed=0, input_size=(32, 32))
    assert any('remote spec' in str(x.message) for x in w)


# -- FastSCNN / ICNet ------------------------------------------------------

def test_fastscnn_icnet_contracts():
    with pytest.raises(AssertionError):   # fusion channel equalities
        build(BACKBONES, 'FastSCNN', global_out_channels=127,
              higher_in_channels=64, lower_in_channels=128)
    with pytest.raises(AssertionError):
        build(BACKBONES, 'FastSCNN', global_in_channels=32,
              higher_in_channels=64)
    with pytest.raises(TypeError):        # ICNet needs a backbone cfg
        build(BACKBONES, 'ICNet', layer_channels=(128, 512))
    build(BACKBONES, 'FastSCNN')
    build(BACKBONES, 'ICNet', backbone_cfg=dict(type='ResNet', depth=18))


# -- STDC / Swin / ResNeXt / ResNeSt ----------------------------------------

def test_stdc_contracts():
    # ≙ reference test_stdc.py:67-99
    with pytest.raises(AssertionError):
        build(BACKBONES, 'STDCNet', stdc_type='STDCNet3')
    with pytest.raises(AssertionError):
        build(BACKBONES, 'STDCNet', bottleneck_type='dog')
    with pytest.raises(AssertionError):
        build(BACKBONES, 'STDCNet',
              channels=(16, 32, 64, 256, 512, 1024))
    build(BACKBONES, 'STDCNet')


def test_swin_contracts():
    # ≙ reference test_swin.py:30-41
    with pytest.raises(TypeError):
        build(BACKBONES, 'SwinTransformer', pretrained=123)
    with pytest.raises(AssertionError):   # non-overlapping patch embed
        build(BACKBONES, 'SwinTransformer', strides=(2, 2, 2, 2),
              patch_size=4)
    with pytest.raises(AssertionError):
        build(BACKBONES, 'SwinTransformer',
              pretrain_img_size=(112, 112, 112))
    build(BACKBONES, 'SwinTransformer', pretrain_img_size=112)


def test_resnext_resnest_contracts():
    from stc_unet_tpu.models.backbones.resnext import (GroupBottleneck,
                                                       SplitBottleneck)
    # depth must be a known arch (≙ test_resnext.py:43-45,
    # test_resnest.py:28-30 — KeyError at construction)
    with pytest.raises(KeyError):
        build(BACKBONES, 'ResNeXt', depth=18)
    with pytest.raises(KeyError):
        build(BACKBONES, 'ResNeSt', depth=18)
    # bottleneck style contract (≙ test_resnext.py:11-13,
    # test_resnest.py:10-12)
    with pytest.raises(AssertionError):
        GroupBottleneck(64, groups=32, base_width=4, style='tensorflow')
    with pytest.raises(AssertionError):
        SplitBottleneck(64, radix=2, style='tensorflow')
    build(BACKBONES, 'ResNeXt', depth=50, groups=32, base_width=4)
    build(BACKBONES, 'ResNeSt', depth=200)


# -- model-utils blocks (≙ reference test_blocks.py) -------------------------

def test_inverted_residual_contracts():
    from stc_unet_tpu.models.utils.inverted_residual import (
        InvertedResidual, InvertedResidualV3, SELayer)
    with pytest.raises(AssertionError):   # stride (ref test_blocks.py:24-26)
        InvertedResidual(32, stride=3)
    with pytest.raises(AssertionError):   # stride (ref :67-69)
        InvertedResidualV3(32, 16, stride=3)
    # with_expand_conv=False requires mid == in (ref :71-73); checked at
    # trace time here because in_channels is inferred from the input
    bad = InvertedResidualV3(32, 16, with_expand_conv=False)
    with pytest.raises(AssertionError):
        bad.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 32)))
    ok = InvertedResidualV3(32, 32, with_expand_conv=False)
    ok.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 32)))
    with pytest.raises(AssertionError):   # act_cfg pair (ref :154-156)
        SELayer(act_cfg=(dict(type='ReLU'),))
    # single-dict act_cfg is duplicated for both gates; default matches
    # the hardcoded ReLU/HSigmoid pair it replaced
    se = SELayer(ratio=4, act_cfg=dict(type='ReLU'))
    se.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 16)))


# -- head-specific contracts, batch 2 ---------------------------------------

def test_lraspp_head_contracts():
    # ≙ reference test_lraspp_head.py:9-32
    common = dict(in_channels=(4, 4, 123), in_index=(0, 1, 2), channels=32,
                  num_classes=19)
    with pytest.raises(ValueError):
        build(HEADS, 'LRASPPHead', input_transform='resize_concat', **common)
    with pytest.raises(AssertionError):
        build(HEADS, 'LRASPPHead', branch_channels=64,
              input_transform='multiple_select', **common)
    with pytest.raises(AssertionError):   # needs len(in_channels)-1 branches
        build(HEADS, 'LRASPPHead', branch_channels=(8, 8, 8),
              input_transform='multiple_select', **common)
    build(HEADS, 'LRASPPHead', input_transform='multiple_select', **common)


def test_misc_head_ctor_contracts():
    # pool/filter/dilation sequences must be list|tuple, and type-specific
    # enums are validated at construction
    with pytest.raises(AssertionError):   # ≙ test_psp_head.py:11-13
        build(HEADS, 'PSPHead', in_channels=4, channels=2, num_classes=19,
              pool_scales=1)
    with pytest.raises(AssertionError):   # ≙ test_uper_head.py:11-13
        build(HEADS, 'UPerHead', in_channels=4, channels=2, num_classes=19)
    with pytest.raises(AssertionError):   # ≙ test_psa_head.py:11-18
        build(HEADS, 'PSAHead', in_channels=4, channels=2, num_classes=19,
              mask_size=(13, 13), psa_type='gather')
    with pytest.raises(AssertionError):   # ≙ test_fcn_head.py:13-15
        build(HEADS, 'FCNHead', num_classes=19, num_convs=-1)
    with pytest.raises(AssertionError):   # ≙ test_dpt_head.py:10-16
        build(HEADS, 'DPTHead', in_channels=[768] * 4, channels=4,
              num_classes=19, in_index=[0, 1, 2, 3])
    with pytest.raises(AssertionError):   # readout enum (dpt_head.py:35)
        build(HEADS, 'DPTHead', in_channels=[768] * 4, channels=4,
              num_classes=19, in_index=[0, 1, 2, 3],
              input_transform='multiple_select', readout_type='weird')
    with pytest.raises(AssertionError):   # ≙ test_dm_head.py:11-13
        build(HEADS, 'DMHead', in_channels=8, channels=4, num_classes=19,
              filter_sizes=1)
    with pytest.raises(AssertionError):   # ≙ test_apc_head.py:11-13
        build(HEADS, 'APCHead', in_channels=8, channels=2, num_classes=19,
              pool_scales=1)
    with pytest.raises(AssertionError):   # ≙ test_aspp_head.py:11-13
        build(HEADS, 'ASPPHead', in_channels=8, channels=4, num_classes=19,
              dilations=1)
    with pytest.raises(AssertionError):   # ≙ test_segformer_head.py:9-12
        build(HEADS, 'SegformerHead', in_channels=(1, 2, 3), in_index=(0, 1),
              channels=5, num_classes=2)


def test_neck_ctor_contracts():
    from stc_unet_tpu.models import NECKS
    with pytest.raises(AssertionError):   # ≙ test_jpu.py:32-34
        build(NECKS, 'JPU', in_channels=(256, 64, 128), start_level=0,
              end_level=5)
    with pytest.raises(AssertionError):   # ≙ test_ic_neck.py:47-53
        build(NECKS, 'ICNeck', in_channels=(16, 64, 64, 64), out_channels=32)
    with pytest.raises(KeyError):         # ≙ test_feature2pyramid.py:36-38
        build(NECKS, 'Feature2Pyramid', embed_dim=64,
              rescales=[4, 2, 0.25, 0])
    build(NECKS, 'JPU', in_channels=(64, 128, 256), start_level=1,
          end_level=-1)
    build(NECKS, 'Feature2Pyramid', embed_dim=64, rescales=[4, 2, 1, 0.5])
