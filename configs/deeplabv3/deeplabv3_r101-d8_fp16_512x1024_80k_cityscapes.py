# Ported from the reference zoo (configs/deeplabv3/deeplabv3_r101-d8_fp16_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3_r101-d8_512x1024_80k_cityscapes.py'
optimizer_config = {'type': 'Fp16OptimizerHook', 'loss_scale': 512.0}
fp16 = {}
