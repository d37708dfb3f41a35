# Ported from the reference zoo (configs/hrnet/fcn_hr18_480x480_80k_pascal_context_59.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_hr18.py',
 '../_base_/datasets/pascal_context_59.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'decode_head': {'num_classes': 59},
 'test_cfg': {'mode': 'slide', 'crop_size': (480, 480), 'stride': (320, 320)}}
optimizer = {'type': 'SGD', 'lr': 0.004, 'momentum': 0.9, 'weight_decay': 0.0001}
