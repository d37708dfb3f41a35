# Ported from the reference zoo (configs/deeplabv3plus/deeplabv3plus_r101_512x512_C-CM+C-WO-NatOcc-SOT.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = '../_base_/datasets/occlude_face.py'
norm_cfg = {'type': 'SyncBN', 'requires_grad': True}
model = {'type': 'EncoderDecoder',
 'pretrained': 'open-mmlab://resnet101_v1c',
 'backbone': {'type': 'ResNetV1c',
              'depth': 101,
              'num_stages': 4,
              'out_indices': (0, 1, 2, 3),
              'dilations': (1, 1, 2, 4),
              'strides': (1, 2, 1, 1),
              'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
              'norm_eval': False,
              'style': 'pytorch',
              'contract_dilation': True},
 'decode_head': {'type': 'DepthwiseSeparableASPPHead',
                 'in_channels': 2048,
                 'in_index': 3,
                 'channels': 512,
                 'dilations': (1, 12, 24, 36),
                 'c1_in_channels': 256,
                 'c1_channels': 48,
                 'dropout_ratio': 0.1,
                 'num_classes': 2,
                 'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                 'align_corners': False,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0},
                 'sampler': {'type': 'OHEMPixelSampler',
                             'thresh': 0.7,
                             'min_kept': 10000}},
 'auxiliary_head': {'type': 'FCNHead',
                    'in_channels': 1024,
                    'in_index': 2,
                    'channels': 256,
                    'num_convs': 1,
                    'concat_input': False,
                    'dropout_ratio': 0.1,
                    'num_classes': 2,
                    'norm_cfg': {'type': 'SyncBN', 'requires_grad': True},
                    'align_corners': False,
                    'loss_decode': {'type': 'CrossEntropyLoss',
                                    'use_sigmoid': False,
                                    'loss_weight': 0.4}},
 'train_cfg': {},
 'test_cfg': {'mode': 'whole'}}
log_config = {'interval': 50, 'hooks': [{'type': 'TextLoggerHook', 'by_epoch': False}]}
dist_params = {'backend': 'nccl'}
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
cudnn_benchmark = True
optimizer = {'type': 'SGD', 'lr': 0.01, 'momentum': 0.9, 'weight_decay': 0.0005}
optimizer_config = {}
lr_config = {'policy': 'poly', 'power': 0.9, 'min_lr': 0.0001, 'by_epoch': False}
runner = {'type': 'IterBasedRunner', 'max_iters': 30000}
checkpoint_config = {'by_epoch': False, 'interval': 400}
evaluation = {'interval': 400, 'metric': ['mIoU', 'mDice', 'mFscore'], 'pre_eval': True}
auto_resume = False
