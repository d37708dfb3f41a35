# Ported from the reference zoo (configs/pspnet/pspnet_r50b-d32_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/pspnet_r50-d8.py',
 '../_base_/datasets/cityscapes.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
model = {'pretrained': 'torchvision://resnet50',
 'backbone': {'type': 'ResNet',
              'dilations': (1, 1, 2, 4),
              'strides': (1, 2, 2, 2)}}
