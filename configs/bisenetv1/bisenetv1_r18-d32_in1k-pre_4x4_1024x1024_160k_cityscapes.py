# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r18-d32_in1k-pre_4x4_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/bisenetv1_r18-d32.py',
 '../_base_/datasets/cityscapes_1024x1024.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
model = {'backbone': {'backbone_cfg': {'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'open-mmlab://resnet18_v1c'}}}}
lr_config = {'warmup': 'linear', 'warmup_iters': 1000}
optimizer = {'lr': 0.025}
data = {'samples_per_gpu': 4, 'workers_per_gpu': 4}
