# Ported from the reference zoo (configs/fcn/fcn_d6_r101b-d16_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fcn_d6_r50b-d16_512x1024_80k_cityscapes.py'
model = {'pretrained': 'torchvision://resnet101',
 'backbone': {'type': 'ResNet', 'depth': 101}}
