# Ported from the reference zoo (configs/mobilenet_v3/lraspp_m-v3s-d8_512x1024_320k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './lraspp_m-v3-d8_512x1024_320k_cityscapes.py'
norm_cfg = {'type': 'SyncBN', 'eps': 0.001, 'requires_grad': True}
model = {'type': 'EncoderDecoder',
 'pretrained': 'open-mmlab://contrib/mobilenet_v3_small',
 'backbone': {'type': 'MobileNetV3',
              'arch': 'small',
              'out_indices': (0, 1, 12),
              'norm_cfg': {'type': 'SyncBN',
                           'eps': 0.001,
                           'requires_grad': True}},
 'decode_head': {'type': 'LRASPPHead',
                 'in_channels': (16, 16, 576),
                 'in_index': (0, 1, 2),
                 'channels': 128,
                 'input_transform': 'multiple_select',
                 'dropout_ratio': 0.1,
                 'num_classes': 19,
                 'norm_cfg': {'type': 'SyncBN',
                              'eps': 0.001,
                              'requires_grad': True},
                 'act_cfg': {'type': 'ReLU'},
                 'align_corners': False,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0}}}
