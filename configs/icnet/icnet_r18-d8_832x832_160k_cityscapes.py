# Ported from the reference zoo (configs/icnet/icnet_r18-d8_832x832_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './icnet_r50-d8_832x832_160k_cityscapes.py'
model = {'backbone': {'layer_channels': (128, 512), 'backbone_cfg': {'depth': 18}}}
