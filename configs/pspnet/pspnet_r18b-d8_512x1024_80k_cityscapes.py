# Ported from the reference zoo (configs/pspnet/pspnet_r18b-d8_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_512x1024_80k_cityscapes.py'
model = {'pretrained': 'torchvision://resnet18',
 'backbone': {'type': 'ResNet', 'depth': 18},
 'decode_head': {'in_channels': 512, 'channels': 128},
 'auxiliary_head': {'in_channels': 256, 'channels': 64}}
