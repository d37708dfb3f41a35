# Ported from the reference zoo (configs/ocrnet/ocrnet_r101-d8_512x1024_80k_b16_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/ocrnet_r50-d8.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
optimizer = {'lr': 0.02}
lr_config = {'min_lr': 0.0002}
