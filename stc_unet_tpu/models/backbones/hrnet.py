"""HRNet backbone (≙ reference ``backbones/hrnet.py``, 642 LoC).

Parallel multi-resolution branches with repeated cross-resolution fusion.
Config vocabulary matches mmseg's ``extra`` dict (stage1..stage4 with
num_modules/num_branches/block/num_blocks/num_channels).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from stc_unet_tpu.ops import resize
from ..bricks import BatchNorm, Conv2d, ConvModule
from ..builder import BACKBONES
from .resnet import BasicBlock, Bottleneck


class HRModule(nn.Module):
    """One multi-branch module: per-branch blocks + full fusion."""
    num_branches: int
    block: type
    num_blocks: Sequence[int]
    in_channels: Sequence[int]
    num_channels: Sequence[int]
    multiscale_output: bool = True

    @nn.compact
    def __call__(self, xs, train: bool = False):
        # branches
        outs = []
        for i in range(self.num_branches):
            x = xs[i]
            for j in range(self.num_blocks[i]):
                needs_ds = (j == 0 and x.shape[-1] !=
                            self.num_channels[i] * self.block.expansion)
                x = self.block(self.num_channels[i], stride=1,
                               downsample=needs_ds,
                               name=f'branches_{i}_{j}')(x, train=train)
            outs.append(x)
        if self.num_branches == 1:
            return outs
        # fuse
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            y = None
            for j in range(self.num_branches):
                z = outs[j]
                if j > i:
                    # upsample j → i: 1x1 conv + BN, then BILINEAR
                    # align_corners=False upsample by 2**(j-i) followed by an
                    # exact-size resize (reference hrnet.py:150-153 puts an
                    # Upsample(scale_factor) in the fuse layer AND resizes to
                    # x[i]'s size in forward at hrnet.py:206-210 — both
                    # interpolations happen)
                    z = Conv2d(self.num_channels[i] * self.block.expansion,
                               1, use_bias=False,
                               name=f'fuse_{i}_{j}_conv')(z)
                    z = BatchNorm(name=f'fuse_{i}_{j}_bn')(z, train=train)
                    s = 2 ** (j - i)
                    up = (z.shape[1] * s, z.shape[2] * s)
                    z = resize(z, size=up, mode='bilinear',
                               align_corners=False, warning=False)
                    if up != tuple(outs[i].shape[1:3]):
                        z = resize(z, size=outs[i].shape[1:3],
                                   mode='bilinear', align_corners=False,
                                   warning=False)
                elif j < i:
                    # downsample j → i via stride-2 3x3 convs
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = (self.num_channels[i] * self.block.expansion
                              if last else z.shape[-1])
                        z = Conv2d(ch, 3, 2, padding=1, use_bias=False,
                                   name=f'fuse_{i}_{j}_down{k}_conv')(z)
                        z = BatchNorm(name=f'fuse_{i}_{j}_down{k}_bn')(
                            z, train=train)
                        if not last:
                            z = nn.relu(z)
                y = z if y is None else y + z
            fused.append(nn.relu(y))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    """High-resolution network."""
    extra: dict = None
    in_channels: int = 3
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    with_cp: bool = False
    frozen_stages: int = -1
    zero_init_residual: bool = False
    multiscale_output: bool = True
    conv_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None

    blocks_dict = {'BASIC': BasicBlock, 'BOTTLENECK': Bottleneck}

    def __post_init__(self):
        # reference ``hrnet.py:251-262``: a 4-stage extra spec is required
        # and each stage's per-branch lists must match num_branches
        from collections.abc import Mapping
        assert isinstance(self.extra, Mapping), \
            'HRNet requires an `extra` dict with stage1..stage4 specs'
        for i in range(4):
            cfg = self.extra.get(f'stage{i + 1}')
            assert cfg is not None, f'extra is missing stage{i + 1}'
            nb = cfg['num_branches']
            assert len(cfg['num_blocks']) == nb, \
                (f'stage{i + 1}: len(num_blocks) '
                 f'({len(cfg["num_blocks"])}) != num_branches ({nb})')
            assert len(cfg['num_channels']) == nb, \
                (f'stage{i + 1}: len(num_channels) '
                 f'({len(cfg["num_channels"])}) != num_branches ({nb})')
            assert cfg['block'] in self.blocks_dict, \
                f'stage{i + 1}: unknown block {cfg["block"]!r}'
        super().__post_init__()

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self.extra
        assert extra is not None, 'HRNet needs the `extra` stage config'
        # stem: two stride-2 convs
        x = Conv2d(64, 3, 2, padding=1, use_bias=False, name='conv1')(x)
        x = nn.relu(BatchNorm(name='bn1')(x, train=train))
        x = Conv2d(64, 3, 2, padding=1, use_bias=False, name='conv2')(x)
        x = nn.relu(BatchNorm(name='bn2')(x, train=train))

        # stage 1: bottleneck layer
        s1 = extra['stage1']
        block1 = self.blocks_dict[s1['block']]
        ch1 = s1['num_channels'][0]
        for j in range(s1['num_blocks'][0]):
            needs_ds = j == 0 and x.shape[-1] != ch1 * block1.expansion
            x = block1(ch1, stride=1, downsample=needs_ds,
                       name=f'layer1_{j}')(x, train=train)
        xs = [x]

        prev_channels = [ch1 * block1.expansion]
        for si, stage_name in enumerate(['stage2', 'stage3', 'stage4']):
            cfg = extra[stage_name]
            block = self.blocks_dict[cfg['block']]
            num_channels = [c * block.expansion
                            for c in cfg['num_channels']]
            # transition: adapt branch count/channels
            new_xs = []
            for i in range(cfg['num_branches']):
                if i < len(xs):
                    if prev_channels[i] != num_channels[i]:
                        z = ConvModule(num_channels[i], 3, padding=1,
                                       norm_cfg=dict(type='BN'),
                                       act_cfg=dict(type='ReLU'),
                                       name=f'transition{si}_{i}')(
                            xs[i], train=train)
                    else:
                        z = xs[i]
                else:
                    # reference hrnet.py:459-477: a NEW branch i gets
                    # (i+1-num_branches_pre) stride-2 conv+BN+ReLU steps from
                    # the LAST previous branch; intermediates keep the source
                    # channel count, only the final step maps to the target
                    z = xs[-1]
                    n_pre = len(xs)
                    for k in range(i + 1 - n_pre):
                        out_ch = num_channels[i] if k == i - n_pre \
                            else z.shape[-1]
                        z = ConvModule(out_ch, 3, stride=2, padding=1,
                                       norm_cfg=dict(type='BN'),
                                       act_cfg=dict(type='ReLU'),
                                       name=f'transition{si}_{i}_{k}'
                                       if i - n_pre else
                                       f'transition{si}_{i}')(
                            z, train=train)
                new_xs.append(z)
            xs = new_xs
            # modules
            for m in range(cfg['num_modules']):
                multiscale = True
                if stage_name == 'stage4' and \
                        m == cfg['num_modules'] - 1:
                    multiscale = self.multiscale_output
                xs = HRModule(cfg['num_branches'], block,
                              cfg['num_blocks'], num_channels,
                              cfg['num_channels'],
                              multiscale_output=multiscale,
                              name=f'{stage_name}_{m}')(xs, train=train)
            prev_channels = [o.shape[-1] for o in xs]
        return xs
