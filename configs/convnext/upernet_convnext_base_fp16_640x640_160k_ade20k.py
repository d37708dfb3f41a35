# Ported from the reference zoo (configs/convnext/upernet_convnext_base_fp16_640x640_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_convnext.py',
 '../_base_/datasets/ade20k_640x640.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
crop_size = (640, 640)
checkpoint_file = 'https://download.openmmlab.com/mmclassification/v0/convnext/downstream/convnext-base_3rdparty_in21k_20220301-262fd037.pth'
model = {'backbone': {'type': 'mmcls.ConvNeXt',
              'arch': 'base',
              'out_indices': [0, 1, 2, 3],
              'drop_path_rate': 0.4,
              'layer_scale_init_value': 1.0,
              'gap_before_final_norm': False,
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmclassification/v0/convnext/downstream/convnext-base_3rdparty_in21k_20220301-262fd037.pth',
                           'prefix': 'backbone.'}},
 'decode_head': {'in_channels': [128, 256, 512, 1024], 'num_classes': 150},
 'auxiliary_head': {'in_channels': 512, 'num_classes': 150},
 'test_cfg': {'mode': 'slide', 'crop_size': (640, 640), 'stride': (426, 426)}}
optimizer = {'constructor': 'LearningRateDecayOptimizerConstructor',
 '_delete_': True,
 'type': 'AdamW',
 'lr': 0.0001,
 'betas': (0.9, 0.999),
 'weight_decay': 0.05,
 'paramwise_cfg': {'decay_rate': 0.9,
                   'decay_type': 'stage_wise',
                   'num_layers': 12}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
data = {'samples_per_gpu': 2}
optimizer_config = {'type': 'Fp16OptimizerHook', 'loss_scale': 'dynamic'}
fp16 = {}
