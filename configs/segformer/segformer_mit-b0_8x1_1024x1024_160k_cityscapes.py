# Ported from the reference zoo (configs/segformer/segformer_mit-b0_8x1_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/segformer_mit-b0.py',
 '../_base_/datasets/cityscapes_1024x1024.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b0_20220624-7e0fe6dd.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b0_20220624-7e0fe6dd.pth'}},
 'test_cfg': {'mode': 'slide', 'crop_size': (1024, 1024), 'stride': (768, 768)}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 6e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.01,
 'paramwise_cfg': {'custom_keys': {'pos_block': {'decay_mult': 0.0},
                                   'norm': {'decay_mult': 0.0},
                                   'head': {'lr_mult': 10.0}}}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
data = {'samples_per_gpu': 1, 'workers_per_gpu': 1}
