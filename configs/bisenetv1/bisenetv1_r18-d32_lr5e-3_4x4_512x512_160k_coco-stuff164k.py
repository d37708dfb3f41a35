# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r18-d32_lr5e-3_4x4_512x512_160k_coco-stuff164k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/bisenetv1_r18-d32.py',
 '../_base_/datasets/coco-stuff164k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'decode_head': {'num_classes': 171},
 'auxiliary_head': [{'type': 'FCNHead',
                     'in_channels': 128,
                     'channels': 64,
                     'num_convs': 1,
                     'num_classes': 171,
                     'in_index': 1,
                     'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                     'concat_input': False,
                     'align_corners': False,
                     'loss_decode': {'type': 'CrossEntropyLoss',
                                     'use_sigmoid': False,
                                     'loss_weight': 1.0}},
                    {'type': 'FCNHead',
                     'in_channels': 128,
                     'channels': 64,
                     'num_convs': 1,
                     'num_classes': 171,
                     'in_index': 2,
                     'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                     'concat_input': False,
                     'align_corners': False,
                     'loss_decode': {'type': 'CrossEntropyLoss',
                                     'use_sigmoid': False,
                                     'loss_weight': 1.0}}]}
lr_config = {'warmup': 'linear', 'warmup_iters': 1000}
optimizer = {'lr': 0.005}
