# Ported from the reference zoo (configs/resnest/fcn_s101-d8_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = '../fcn/fcn_r101-d8_512x512_160k_ade20k.py'
model = {'pretrained': 'open-mmlab://resnest101',
 'backbone': {'type': 'ResNeSt',
              'stem_channels': 128,
              'radix': 2,
              'reduction_factor': 4,
              'avg_down_stride': True}}
