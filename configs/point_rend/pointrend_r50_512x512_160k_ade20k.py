# Ported from the reference zoo (configs/point_rend/pointrend_r50_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/pointrend_r50.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'decode_head': [{'type': 'FPNHead',
                  'in_channels': [256, 256, 256, 256],
                  'in_index': [0, 1, 2, 3],
                  'feature_strides': [4, 8, 16, 32],
                  'channels': 128,
                  'dropout_ratio': -1,
                  'num_classes': 150,
                  'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                  'align_corners': False,
                  'loss_decode': {'type': 'CrossEntropyLoss',
                                  'use_sigmoid': False,
                                  'loss_weight': 1.0}},
                 {'type': 'PointHead',
                  'in_channels': [256],
                  'in_index': [0],
                  'channels': 256,
                  'num_fcs': 3,
                  'coarse_pred_each_layer': True,
                  'dropout_ratio': -1,
                  'num_classes': 150,
                  'align_corners': False,
                  'loss_decode': {'type': 'CrossEntropyLoss',
                                  'use_sigmoid': False,
                                  'loss_weight': 1.0}}]}
lr_config = {'warmup': 'linear', 'warmup_iters': 200}
