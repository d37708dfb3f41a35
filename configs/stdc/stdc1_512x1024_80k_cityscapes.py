# Ported from the reference zoo (configs/stdc/stdc1_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/stdc.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
lr_config = {'warmup': 'linear', 'warmup_iters': 1000}
data = {'samples_per_gpu': 12, 'workers_per_gpu': 4}
