# Ported from the reference zoo (configs/icnet/icnet_r50-d8_832x832_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/icnet_r50-d8.py',
 '../_base_/datasets/cityscapes_832x832.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
