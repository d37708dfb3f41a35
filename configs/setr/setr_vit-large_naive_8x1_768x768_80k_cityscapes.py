# Ported from the reference zoo (configs/setr/setr_vit-large_naive_8x1_768x768_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/setr_naive.py',
 '../_base_/datasets/cityscapes_768x768.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'pretrained': None,
 'backbone': {'drop_rate': 0.0,
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'pretrain/vit_large_p16.pth'}},
 'test_cfg': {'mode': 'slide', 'crop_size': (768, 768), 'stride': (512, 512)}}
optimizer = {'weight_decay': 0.0,
 'paramwise_cfg': {'custom_keys': {'head': {'lr_mult': 10.0}}}}
data = {'samples_per_gpu': 1}
