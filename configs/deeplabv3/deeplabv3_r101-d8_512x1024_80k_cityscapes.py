# Ported from the reference zoo (configs/deeplabv3/deeplabv3_r101-d8_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3_r50-d8_512x1024_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
