# Ported from the reference zoo (configs/deeplabv3/deeplabv3_r50-d8_512x512_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/deeplabv3_r50-d8.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'decode_head': {'num_classes': 150}, 'auxiliary_head': {'num_classes': 150}}
