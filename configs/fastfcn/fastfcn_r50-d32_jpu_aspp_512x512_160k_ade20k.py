# Ported from the reference zoo (configs/fastfcn/fastfcn_r50-d32_jpu_aspp_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fastfcn_r50-d32_jpu_psp_512x512_160k_ade20k.py'
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'decode_head': {'_delete_': True,
                 'type': 'ASPPHead',
                 'in_channels': 2048,
                 'in_index': 2,
                 'channels': 512,
                 'dilations': (1, 12, 24, 36),
                 'dropout_ratio': 0.1,
                 'num_classes': 150,
                 'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                 'align_corners': False,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0}},
 'train_cfg': {},
 'test_cfg': {'mode': 'whole'}}
