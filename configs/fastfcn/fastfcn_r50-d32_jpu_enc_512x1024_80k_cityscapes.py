# Ported from the reference zoo (configs/fastfcn/fastfcn_r50-d32_jpu_enc_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fastfcn_r50-d32_jpu_psp_512x1024_80k_cityscapes.py'
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'decode_head': {'_delete_': True,
                 'type': 'EncHead',
                 'in_channels': [512, 1024, 2048],
                 'in_index': (0, 1, 2),
                 'channels': 512,
                 'num_codes': 32,
                 'use_se_loss': True,
                 'add_lateral': False,
                 'dropout_ratio': 0.1,
                 'num_classes': 19,
                 'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                 'align_corners': False,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0},
                 'loss_se_decode': {'type': 'CrossEntropyLoss',
                                    'use_sigmoid': True,
                                    'loss_weight': 0.2}},
 'train_cfg': {},
 'test_cfg': {'mode': 'whole'}}
