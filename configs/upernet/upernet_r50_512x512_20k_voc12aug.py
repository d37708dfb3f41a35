# Ported from the reference zoo (configs/upernet/upernet_r50_512x512_20k_voc12aug.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_r50.py',
 '../_base_/datasets/pascal_voc12_aug.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_20k.py']
model = {'decode_head': {'num_classes': 21}, 'auxiliary_head': {'num_classes': 21}}
