# Ported from the reference zoo (configs/fcn/fcn_r50-d8_480x480_40k_pascal_context.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_r50-d8.py',
 '../_base_/datasets/pascal_context.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_40k.py']
model = {'decode_head': {'num_classes': 60},
 'auxiliary_head': {'num_classes': 60},
 'test_cfg': {'mode': 'slide', 'crop_size': (480, 480), 'stride': (320, 320)}}
optimizer = {'type': 'SGD', 'lr': 0.004, 'momentum': 0.9, 'weight_decay': 0.0001}
