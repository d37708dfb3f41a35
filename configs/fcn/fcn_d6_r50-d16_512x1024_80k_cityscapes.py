# Ported from the reference zoo (configs/fcn/fcn_d6_r50-d16_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_r50-d8.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'backbone': {'dilations': (1, 1, 1, 2), 'strides': (1, 2, 2, 1)},
 'decode_head': {'dilation': 6},
 'auxiliary_head': {'dilation': 6}}
