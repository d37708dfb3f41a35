# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r50-d32_4x4_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/bisenetv1_r18-d32.py',
 '../_base_/datasets/cityscapes_1024x1024.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'type': 'EncoderDecoder',
 'backbone': {'type': 'BiSeNetV1',
              'context_channels': (512, 1024, 2048),
              'spatial_channels': (256, 256, 256, 512),
              'out_channels': 1024,
              'backbone_cfg': {'type': 'ResNet', 'depth': 50}},
 'decode_head': {'type': 'FCNHead',
                 'in_channels': 1024,
                 'in_index': 0,
                 'channels': 1024},
 'auxiliary_head': [{'type': 'FCNHead',
                     'in_channels': 512,
                     'channels': 256,
                     'num_convs': 1,
                     'num_classes': 19,
                     'in_index': 1,
                     'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                     'concat_input': False},
                    {'type': 'FCNHead',
                     'in_channels': 512,
                     'channels': 256,
                     'num_convs': 1,
                     'num_classes': 19,
                     'in_index': 2,
                     'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                     'concat_input': False}]}
lr_config = {'warmup': 'linear', 'warmup_iters': 1000}
optimizer = {'lr': 0.05}
data = {'samples_per_gpu': 4, 'workers_per_gpu': 4}
