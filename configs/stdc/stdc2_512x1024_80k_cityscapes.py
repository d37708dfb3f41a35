# Ported from the reference zoo (configs/stdc/stdc2_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './stdc1_512x1024_80k_cityscapes.py'
model = {'backbone': {'backbone_cfg': {'stdc_type': 'STDCNet2'}}}
