# Ported from the reference zoo (configs/bisenetv1/bisenetv1_r18-d32_in1k-pre_4x8_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './bisenetv1_r18-d32_in1k-pre_4x4_1024x1024_160k_cityscapes.py'
data = {'samples_per_gpu': 8, 'workers_per_gpu': 4}
