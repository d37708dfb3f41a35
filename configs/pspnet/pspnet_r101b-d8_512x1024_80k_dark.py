# Ported from the reference zoo (configs/pspnet/pspnet_r101b-d8_512x1024_80k_dark.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_512x1024_80k_dark.py'
model = {'pretrained': 'torchvision://resnet101',
 'backbone': {'type': 'ResNet', 'depth': 101}}
