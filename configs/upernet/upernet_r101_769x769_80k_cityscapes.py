# Ported from the reference zoo (configs/upernet/upernet_r101_769x769_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './upernet_r50_769x769_80k_cityscapes.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
