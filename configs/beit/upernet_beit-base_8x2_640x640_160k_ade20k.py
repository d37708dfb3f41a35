# Ported from the reference zoo (configs/beit/upernet_beit-base_8x2_640x640_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_beit.py',
 '../_base_/datasets/ade20k_640x640.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
model = {'pretrained': 'pretrain/beit_base_patch16_224_pt22k_ft22k.pth',
 'test_cfg': {'mode': 'slide', 'crop_size': (640, 640), 'stride': (426, 426)}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 3e-05,
 'betas': (0.9, 0.999),
 'weight_decay': 0.05,
 'constructor': 'LayerDecayOptimizerConstructor',
 'paramwise_cfg': {'num_layers': 12, 'layer_decay_rate': 0.9}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
data = {'samples_per_gpu': 2}
