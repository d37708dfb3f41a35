# Ported from the reference zoo (configs/_base_/models/lraspp_m-v3-d8.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
norm_cfg = {'type': 'SyncBN', 'eps': 0.001, 'requires_grad': True}
model = {'type': 'EncoderDecoder',
 'backbone': {'type': 'MobileNetV3',
              'arch': 'large',
              'out_indices': (1, 3, 16),
              'norm_cfg': {'type': 'SyncBN', 'eps': 0.001, 'requires_grad': True}},
 'decode_head': {'type': 'LRASPPHead',
                 'in_channels': (16, 24, 960),
                 'in_index': (0, 1, 2),
                 'channels': 128,
                 'input_transform': 'multiple_select',
                 'dropout_ratio': 0.1,
                 'num_classes': 19,
                 'norm_cfg': {'type': 'SyncBN', 'eps': 0.001, 'requires_grad': True},
                 'act_cfg': {'type': 'ReLU'},
                 'align_corners': False,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0}},
 'train_cfg': {},
 'test_cfg': {'mode': 'whole'}}
