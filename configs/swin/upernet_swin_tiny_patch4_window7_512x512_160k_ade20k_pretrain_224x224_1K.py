# Ported from the reference zoo (configs/swin/upernet_swin_tiny_patch4_window7_512x512_160k_ade20k_pretrain_224x224_1K.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_swin.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
checkpoint_file = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_tiny_patch4_window7_224_20220317-1cdeb081.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/swin/swin_tiny_patch4_window7_224_20220317-1cdeb081.pth'},
              'embed_dims': 96,
              'depths': [2, 2, 6, 2],
              'num_heads': [3, 6, 12, 24],
              'window_size': 7,
              'use_abs_pos_embed': False,
              'drop_path_rate': 0.3,
              'patch_norm': True},
 'decode_head': {'in_channels': [96, 192, 384, 768], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 384, 'num_classes': 150}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 6e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.01,
 'paramwise_cfg': {'custom_keys': {'absolute_pos_embed': {'decay_mult': 0.0},
                                   'relative_position_bias_table': {'decay_mult': 0.0},
                                   'norm': {'decay_mult': 0.0}}}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
data = {'samples_per_gpu': 2}
