# Ported from the reference zoo (configs/pspnet/pspnet_r101-d8_480x480_40k_pascal_context_59.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './pspnet_r50-d8_480x480_40k_pascal_context_59.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
