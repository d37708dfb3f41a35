# Ported from the reference zoo (configs/dpt/dpt_vit-b16_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/dpt_vit-b16.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 6e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.01,
 'paramwise_cfg': {'custom_keys': {'pos_embed': {'decay_mult': 0.0},
                                   'cls_token': {'decay_mult': 0.0},
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
