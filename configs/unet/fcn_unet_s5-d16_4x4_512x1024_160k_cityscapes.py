# Ported from the reference zoo (configs/unet/fcn_unet_s5-d16_4x4_512x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_unet_s5-d16.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
model = {'decode_head': {'num_classes': 19},
 'auxiliary_head': {'num_classes': 19},
 'train_cfg': {},
 'test_cfg': {'mode': 'whole'}}
data = {'samples_per_gpu': 4, 'workers_per_gpu': 4}
