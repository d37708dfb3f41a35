# Ported from the reference zoo (configs/hrnet/fcn_hr18_512x512_80k_potsdam.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_hr18.py',
 '../_base_/datasets/potsdam.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'decode_head': {'num_classes': 6}}
