# Ported from the reference zoo (configs/resnest/pspnet_s101-d8_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = '../pspnet/pspnet_r101-d8_512x1024_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnest101',
 'backbone': {'type': 'ResNeSt',
              'stem_channels': 128,
              'radix': 2,
              'reduction_factor': 4,
              'avg_down_stride': True}}
