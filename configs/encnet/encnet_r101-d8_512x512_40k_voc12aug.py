# Ported from the reference zoo (configs/encnet/encnet_r101-d8_512x512_40k_voc12aug.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './encnet_r50-d8_512x512_40k_voc12aug.py'
model = {'pretrained': 'open-mmlab://resnet101_v1c', 'backbone': {'depth': 101}}
