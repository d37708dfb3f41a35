# Ported from the reference zoo (configs/isanet/isanet_r50-d8_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/isanet_r50-d8.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
