# Ported from the reference zoo (configs/mae/upernet_mae-base_fp16_8x2_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/upernet_mae.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_160k.py']
model = {'pretrained': './pretrain/mae_pretrain_vit_base_mmcls.pth',
 'backbone': {'type': 'MAE',
              'img_size': (512, 512),
              'patch_size': 16,
              'embed_dims': 768,
              'num_layers': 12,
              'num_heads': 12,
              'mlp_ratio': 4,
              'init_values': 1.0,
              'drop_path_rate': 0.1,
              'out_indices': [3, 5, 7, 11]},
 'neck': {'embed_dim': 768, 'rescales': [4, 2, 1, 0.5]},
 'decode_head': {'in_channels': [768, 768, 768, 768],
                 'num_classes': 150,
                 'channels': 768},
 'auxiliary_head': {'in_channels': 768, 'num_classes': 150},
 'test_cfg': {'mode': 'slide', 'crop_size': (512, 512), 'stride': (341, 341)}}
optimizer = {'_delete_': True,
 'type': 'AdamW',
 'lr': 0.0001,
 'betas': (0.9, 0.999),
 'weight_decay': 0.05,
 'constructor': 'LayerDecayOptimizerConstructor',
 'paramwise_cfg': {'num_layers': 12, 'layer_decay_rate': 0.65}}
lr_config = {'_delete_': True,
 'policy': 'poly',
 'warmup': 'linear',
 'warmup_iters': 1500,
 'warmup_ratio': 1e-06,
 'power': 1.0,
 'min_lr': 0.0,
 'by_epoch': False}
fp16 = {'loss_scale': 'dynamic'}
data = {'samples_per_gpu': 2}
