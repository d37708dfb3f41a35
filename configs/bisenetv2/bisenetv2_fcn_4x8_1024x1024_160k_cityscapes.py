# Ported from the reference zoo (configs/bisenetv2/bisenetv2_fcn_4x8_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/bisenetv2.py',
 '../_base_/datasets/cityscapes_1024x1024.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
lr_config = {'warmup': 'linear', 'warmup_iters': 1000}
optimizer = {'lr': 0.05}
data = {'samples_per_gpu': 8, 'workers_per_gpu': 4}
