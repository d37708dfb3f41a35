# Ported from the reference zoo (configs/upernet/upernet_r18_512x512_20k_voc12aug.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_r50.py',
 '../_base_/datasets/pascal_voc12_aug.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_20k.py']
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'in_channels': [64, 128, 256, 512], 'num_classes': 21},
 'auxiliary_head': {'in_channels': 256, 'num_classes': 21}}
