# Ported from the reference zoo (configs/fastfcn/fastfcn_r50-d32_jpu_psp_4x4_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fastfcn_r50-d32_jpu_psp.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
data = {'samples_per_gpu': 4, 'workers_per_gpu': 4}
