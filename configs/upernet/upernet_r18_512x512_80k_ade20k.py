# Ported from the reference zoo (configs/upernet/upernet_r18_512x512_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_r50.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'pretrained': 'open-mmlab://resnet18_v1c',
 'backbone': {'depth': 18},
 'decode_head': {'in_channels': [64, 128, 256, 512], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 256, 'num_classes': 150}}
