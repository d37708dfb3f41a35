"""CGNet, ERFNet and ICNet backbones + ICNeck
(≙ reference ``backbones/cgnet.py`` (372), ``erfnet.py`` (329),
``icnet.py`` (166), ``necks/ic_neck.py`` (148))."""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import (BatchNorm, Conv2d, ConvModule, Linear,
                      PReLU, avg_pool2d)
from ..builder import BACKBONES, NECKS


class ContextGuidedBlock(nn.Module):
    """CG block (reference ``cgnet.py:54``): local + surrounding (dilated)
    depthwise convs, joint BN + learned PReLU, global-context gate."""
    out_channels: int
    dilation: int = 2
    reduction: int = 16
    skip_connect: bool = True
    downsample: bool = False
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = self.out_channels if self.downsample \
            else self.out_channels // 2
        stride = 2 if self.downsample else 1
        k = 3 if self.downsample else 1
        g = ConvModule(channels, k, stride=stride,
                       padding=(k - 1) // 2, norm_cfg=self.norm_cfg,
                       act_cfg=dict(type='PReLU'),
                       name='conv1x1')(x, train=train)
        loc = Conv2d(channels, 3, padding=1, groups=channels,
                     use_bias=False, name='f_loc')(g)
        sur = Conv2d(channels, 3, padding=self.dilation,
                     dilation=self.dilation, groups=channels,
                     use_bias=False, name='f_sur')(g)
        joi = jnp.concatenate([loc, sur], axis=-1)
        joi = BatchNorm(name='bn')(joi, train=train)
        joi = PReLU(name='activate')(joi)
        if self.downsample:
            joi = Conv2d(self.out_channels, 1, use_bias=False,
                         name='bottleneck')(joi)
        # global context gate (reference GlobalContextExtractor)
        s = jnp.mean(joi, axis=(1, 2))
        s = nn.relu(Linear(self.out_channels // self.reduction,
                           name='fc1')(s))
        s = nn.sigmoid(Linear(self.out_channels, name='fc2')(s))
        out = joi * s[:, None, None, :]
        if self.skip_connect and not self.downsample:
            out = x + out
        return out


def _input_injection(x, n: int):
    """reference ``cgnet.py:171`` InputInjection: n stacked
    AvgPool2d(3, stride=2, padding=1) over the RAW input (count includes
    the zero padding, torch default) — NOT a bilinear resize."""
    for _ in range(n):
        x = avg_pool2d(x, 3, stride=2, padding=1)
    return x


class _NormPReLU(nn.Module):
    """BN + PReLU pair (reference ``norm_prelu_{0,1,2}`` Sequentials)."""
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name='norm')(x, train=train)
        return PReLU(name='activate')(x)


@BACKBONES.register_module()
class CGNet(nn.Module):
    """Context-guided network (reference ``cgnet.py:186``): 3-conv stem,
    avg-pool input injections at /2 and /4, two CG stages whose outputs
    concat the stage\'s first (downsampling) block — stage 1 additionally
    concats the /4 input injection, and stage 2 concats in the REVERSED
    (down2, x) order."""
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    reductions: Sequence[int] = (8, 16)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``cgnet.py:201-216``: tuple lengths are fixed by the
        # three-stage architecture
        assert isinstance(self.num_channels, (tuple, list)) and \
            len(self.num_channels) == 3, \
            f'num_channels must be a 3-tuple, got {self.num_channels!r}'
        for name, n in (('num_blocks', self.num_blocks),
                        ('dilations', self.dilations),
                        ('reductions', self.reductions)):
            assert isinstance(n, (tuple, list)) and len(n) == 2, \
                f'{name} must be a 2-tuple, got {n!r}'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm_cfg = self.norm_cfg or dict(type='BN')
        inp = x
        inp_2x = _input_injection(inp, 1)
        inp_4x = _input_injection(inp, 2)
        cur = x
        for i in range(3):
            cur = ConvModule(self.num_channels[0], 3,
                             stride=2 if i == 0 else 1, padding=1,
                             norm_cfg=norm_cfg,
                             act_cfg=dict(type='PReLU'),
                             name=f'stem_{i}')(cur, train=train)
        cur = _NormPReLU(norm_cfg, name='norm_prelu_0')(
            jnp.concatenate([cur, inp_2x], axis=-1), train=train)
        outs = [cur]
        # stage 1: concat (x, down1, inp_4x); stage 2: concat (down2, x)
        for si in range(2):
            first = None
            for j in range(self.num_blocks[si]):
                cur = ContextGuidedBlock(
                    self.num_channels[si + 1],
                    dilation=self.dilations[si],
                    reduction=self.reductions[si],
                    downsample=(j == 0), norm_cfg=norm_cfg,
                    name=f'level{si + 1}_{j}')(cur, train=train)
                if j == 0:
                    first = cur
            if si == 0:
                cat = jnp.concatenate([cur, first, inp_4x], axis=-1)
            else:
                cat = jnp.concatenate([first, cur], axis=-1)
            cur = _NormPReLU(norm_cfg, name=f'norm_prelu_{si + 1}')(
                cat, train=train)
            outs.append(cur)
        return outs


class NonBottleneck1d(nn.Module):
    """ERFNet factorized residual block (3x1 + 1x3 pairs).

    BN eps 1e-3: the reference builds every ERFNet norm from
    ``norm_cfg=dict(type='BN', eps=1e-3)`` (erfnet.py:35,96,166)."""
    channels: int
    dilation: int = 1
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        y = Conv2d(self.channels, (3, 1), padding=(1, 0), name='conv1a')(x)
        y = nn.relu(y)
        y = Conv2d(self.channels, (1, 3), padding=(0, 1), name='conv1b')(y)
        y = nn.relu(BatchNorm(eps=1e-3, name='bn1')(y, train=train))
        y = Conv2d(self.channels, (3, 1), padding=(d, 0),
                   dilation=(d, 1), name='conv2a')(y)
        y = nn.relu(y)
        y = Conv2d(self.channels, (1, 3), padding=(0, d),
                   dilation=(1, d), name='conv2b')(y)
        y = BatchNorm(eps=1e-3, name='bn2')(y, train=train)
        y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return nn.relu(x + y)


class ERFDownsampler(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..bricks import max_pool2d
        from stc_unet_tpu.ops import resize as _resize
        conv = Conv2d(self.out_channels - x.shape[-1], 3, 2, padding=1,
                      name='conv')(x)
        pool = max_pool2d(x, 2, 2)
        if pool.shape[1:3] != conv.shape[1:3]:
            # reference erfnet.py:54-62: bilinear-resize the pooled branch
            # to the conv branch's size (they differ at odd inputs)
            pool = _resize(pool, size=conv.shape[1:3], mode='bilinear',
                           align_corners=False, warning=False)
        y = jnp.concatenate([conv, pool], axis=-1)
        return nn.relu(BatchNorm(eps=1e-3, name='bn')(y, train=train))


@BACKBONES.register_module()
class ERFNet(nn.Module):
    """Efficient residual factorized network (encoder-decoder)."""
    in_channels: int = 3
    enc_downsample_channels: Sequence[int] = (16, 64, 128)
    enc_stage_non_bottlenecks: Sequence[int] = (5, 8)
    enc_non_bottleneck_dilations: Sequence[int] = (2, 4, 8, 16)
    enc_non_bottleneck_channels: Sequence[int] = (64, 128)
    dec_upsample_channels: Sequence[int] = (64, 16)
    dec_stages_non_bottleneck: Sequence[int] = (2, 2)
    dec_non_bottleneck_channels: Sequence[int] = (64, 16)
    dropout_ratio: float = 0.1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``erfnet.py:245-268`` stage-count invariants
        n_enc = len(self.enc_downsample_channels)
        assert n_enc == len(self.dec_upsample_channels) + 1, \
            'encoder downsample blocks must be decoder upsample blocks + 1'
        assert n_enc == len(self.enc_stage_non_bottlenecks) + 1, \
            'encoder downsample blocks must be non-bottleneck stages + 1'
        assert n_enc == len(self.enc_non_bottleneck_channels) + 1, \
            'encoder downsample blocks must be non-bottleneck channels + 1'
        assert self.enc_stage_non_bottlenecks[-1] % \
            len(self.enc_non_bottleneck_dilations) == 0, \
            'last encoder stage depth must divide by the dilation cycle'
        assert len(self.dec_upsample_channels) == \
            len(self.dec_stages_non_bottleneck), \
            'decoder upsample blocks must match decoder stages'
        assert len(self.dec_stages_non_bottleneck) == \
            len(self.dec_non_bottleneck_channels), \
            'decoder stages must match decoder channels'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        # encoder
        x = ERFDownsampler(self.enc_downsample_channels[0],
                           name='down0')(x, train=train)
        x = ERFDownsampler(self.enc_downsample_channels[1],
                           name='down1')(x, train=train)
        for i in range(self.enc_stage_non_bottlenecks[0]):
            # reference erfnet.py:306-309: every encoder block gets
            # dropout_ratio (NOT the original paper's 0.03 for stage 1)
            x = NonBottleneck1d(self.enc_non_bottleneck_channels[0],
                                drop_rate=self.dropout_ratio,
                                name=f'enc1_{i}')(x, train=train)
        x = ERFDownsampler(self.enc_downsample_channels[2],
                           name='down2')(x, train=train)
        n2 = self.enc_stage_non_bottlenecks[1]
        dils = self.enc_non_bottleneck_dilations
        for i in range(n2):
            x = NonBottleneck1d(self.enc_non_bottleneck_channels[1],
                                dilation=dils[i % len(dils)],
                                drop_rate=self.dropout_ratio,
                                name=f'enc2_{i}')(x, train=train)
        # decoder
        for si in range(len(self.dec_upsample_channels)):
            # reference erfnet.py:313-319: upsampler width comes from
            # dec_non_bottleneck_channels (dec_upsample_channels only
            # feeds the ctor count asserts)
            ch = self.dec_non_bottleneck_channels[si]
            # reference erfnet.py:175-183: ConvTranspose2d(3, s2, pad 1,
            # output_padding 1) — torch-exact alignment via the brick
            from ..bricks import ConvTranspose2d as _CT
            x = _CT(ch, 3, 2, padding=1, output_padding=1,
                    name=f'up{si}')(x)
            x = nn.relu(BatchNorm(eps=1e-3, name=f'up{si}_bn')(x,
                                                               train=train))
            for i in range(self.dec_stages_non_bottleneck[si]):
                x = NonBottleneck1d(self.dec_non_bottleneck_channels[si],
                                    name=f'dec{si}_{i}')(x, train=train)
        return [x]


@BACKBONES.register_module()
class ICNet(nn.Module):
    """Image-cascade network: 3 resolution branches over a shared backbone."""
    backbone_cfg: dict = None
    in_channels: int = 3
    layer_channels: Sequence[int] = (512, 2048)
    light_branch_middle_channels: int = 32
    psp_out_channels: int = 512
    out_channels: Sequence[int] = (64, 256, 256)
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # reference ``icnet.py:71``: the cascade needs a real backbone cfg
        if self.backbone_cfg is None:
            raise TypeError('backbone_cfg must be passed from config file!')
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..builder import BACKBONES as REG
        from .psp_like import PPMJoin
        norm_cfg = self.norm_cfg or dict(type='BN')
        act_cfg = self.act_cfg or dict(type='ReLU')
        # sub1: light conv branch at full res — mmcv ConvModules built
        # WITHOUT act_cfg → default ReLU (reference icnet.py:96-118);
        # conv_sub2/4 likewise use the ConvModule default act.
        s1 = x
        for i, (ch, s) in enumerate([
                (self.light_branch_middle_channels, 2),
                (self.light_branch_middle_channels, 2),
                (self.out_channels[0], 2)]):
            s1 = ConvModule(ch, 3, s, padding=1, norm_cfg=norm_cfg,
                            act_cfg=dict(type='ReLU'),
                            name=f'conv_sub1_{i}')(s1, train=train)
        # sub2/sub4: the trunk split mid-network (reference
        # icnet.py:140-156): stem + CEIL-mode maxpool + layer1/2 on the
        # half-res input; the layer2 feature is halved AGAIN before
        # layer3/4 run (the icnet_cascade flag on our ResNet). out_indices
        # must cover stages 1 and 3.
        half = resize(x, scale_factor=0.5, mode='bilinear',
                      align_corners=self.align_corners, warning=False)
        backbone = REG.build(dict(self.backbone_cfg))
        feats = backbone(half, train=train, icnet_cascade=True,
                         icnet_align_corners=self.align_corners)
        s2 = feats[1]
        s4 = feats[-1]
        # PSP over layer4: pooled branches (each projected to
        # psp_out_channels) concatenated BEFORE x, then a 3x3 bottleneck
        # (reference icnet.py:77-94,150-152 + psp_head.py PPM)
        s4 = PPMJoin(self.psp_out_channels, tuple(self.pool_scales),
                     norm_cfg=norm_cfg, act_cfg=act_cfg,
                     align_corners=self.align_corners,
                     branch_channels=self.psp_out_channels, x_first=False,
                     name='psp')(s4, train=train)
        s2 = ConvModule(self.out_channels[1], 1, norm_cfg=norm_cfg,
                        act_cfg=dict(type='ReLU'),
                        name='conv_sub2')(s2, train=train)
        s4 = ConvModule(self.out_channels[2], 1, norm_cfg=norm_cfg,
                        act_cfg=dict(type='ReLU'),
                        name='conv_sub4')(s4, train=train)
        return [s1, s2, s4]


class CascadeFeatureFusion(nn.Module):
    """ICNeck CFF unit."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        # reference ic_neck.py:47-77: both ConvModules carry the act_cfg
        # (default ReLU), and the auxiliary output is the conv_low RESULT
        # (post-act), not the resized input.
        act = self.act_cfg or dict(type='ReLU')
        low = resize(low, size=high.shape[1:3], mode='bilinear',
                     align_corners=self.align_corners, warning=False)
        low_f = ConvModule(self.out_channels, 3, padding=2, dilation=2,
                           norm_cfg=self.norm_cfg, act_cfg=act,
                           name='conv_low')(low, train=train)
        high_f = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                            act_cfg=act, name='conv_high')(high,
                                                           train=train)
        return nn.relu(low_f + high_f), low_f


@NECKS.register_module()
class ICNeck(nn.Module):
    """Fuse the three ICNet branches (reference ``ic_neck.py``)."""
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    align_corners: bool = False
    init_cfg: Optional[dict] = None

    def __post_init__(self):
        # ≙ reference ``ic_neck.py:112`` (test_ic_neck.py:47-53)
        assert len(self.in_channels) == 3, \
            'Length of input channels must be 3!'
        super().__post_init__()

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == 3, 'Length of input feature maps must be 3!'
        s1, s2, s4 = inputs
        fused24, up4 = CascadeFeatureFusion(
            self.out_channels, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, align_corners=self.align_corners,
            name='cff_24')(s4, s2, train=train)
        fused12, up2 = CascadeFeatureFusion(
            self.out_channels, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, align_corners=self.align_corners,
            name='cff_12')(fused24, s1, train=train)
        return [up4, up2, fused12]
