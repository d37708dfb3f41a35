# Ported from the reference zoo (configs/hrnet/fcn_hr18_4x4_896x896_80k_isaid.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_hr18.py',
 '../_base_/datasets/isaid.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'decode_head': {'num_classes': 16}}
