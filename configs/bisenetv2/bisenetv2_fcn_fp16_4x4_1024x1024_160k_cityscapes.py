# Ported from the reference zoo (configs/bisenetv2/bisenetv2_fcn_fp16_4x4_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './bisenetv2_fcn_4x4_1024x1024_160k_cityscapes.py'
optimizer_config = {'type': 'Fp16OptimizerHook', 'loss_scale': 512.0}
fp16 = {}
