# Ported from the reference zoo (configs/hrnet/fcn_hr18s_4x4_512x512_80k_vaihingen.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fcn_hr18_4x4_512x512_80k_vaihingen.py'
model = {'pretrained': 'open-mmlab://msra/hrnetv2_w18_small',
 'backbone': {'extra': {'stage1': {'num_blocks': (2,)},
                        'stage2': {'num_blocks': (2, 2)},
                        'stage3': {'num_modules': 3, 'num_blocks': (2, 2, 2)},
                        'stage4': {'num_modules': 2,
                                   'num_blocks': (2, 2, 2, 2)}}}}
