# Ported from the reference zoo (configs/deeplabv3plus/deeplabv3plus_r50b-d8_769x769_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3plus_r50-d8_769x769_80k_cityscapes.py'
model = {'pretrained': 'torchvision://resnet50', 'backbone': {'type': 'ResNet'}}
