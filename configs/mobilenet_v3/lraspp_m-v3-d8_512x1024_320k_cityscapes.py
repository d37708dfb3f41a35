# Ported from the reference zoo (configs/mobilenet_v3/lraspp_m-v3-d8_512x1024_320k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/lraspp_m-v3-d8.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
model = {'pretrained': 'open-mmlab://contrib/mobilenet_v3_large'}
data = {'samples_per_gpu': 4, 'workers_per_gpu': 4}
runner = {'type': 'IterBasedRunner', 'max_iters': 320000}
