# Ported from the reference zoo (configs/fcn/fcn_d6_r101-d16_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fcn_d6_r50-d16_512x1024_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
