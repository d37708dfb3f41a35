# Ported from the reference zoo (configs/fcn/fcn_d6_r50-d16_769x769_40k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_r50-d8.py',
 '../_base_/datasets/cityscapes_769x769.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_40k.py']
model = {'backbone': {'dilations': (1, 1, 1, 2), 'strides': (1, 2, 2, 1)},
 'decode_head': {'align_corners': True, 'dilation': 6},
 'auxiliary_head': {'align_corners': True, 'dilation': 6},
 'test_cfg': {'mode': 'slide', 'crop_size': (769, 769), 'stride': (513, 513)}}
