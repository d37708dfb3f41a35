# Ported from the reference zoo (configs/twins/twins_svt-s_uperhead_8x2_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/twins_pcpvt-s_upernet.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_small_20220308-7e1c3695.pth'
model = {'backbone': {'type': 'SVT',
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_small_20220308-7e1c3695.pth'},
              'embed_dims': [64, 128, 256, 512],
              'num_heads': [2, 4, 8, 16],
              'mlp_ratios': [4, 4, 4, 4],
              'depths': [2, 2, 10, 4],
              'windiow_sizes': [7, 7, 7, 7],
              'norm_after_stage': True},
 'decode_head': {'in_channels': [64, 128, 256, 512]},
 'auxiliary_head': {'in_channels': 256}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 6e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.01,
 'paramwise_cfg': {'custom_keys': {'pos_block': {'decay_mult': 0.0},
                                   'norm': {'decay_mult': 0.0}}}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
data = {'samples_per_gpu': 2, 'workers_per_gpu': 2}
