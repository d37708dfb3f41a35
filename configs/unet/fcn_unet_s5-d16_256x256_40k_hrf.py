# Ported from the reference zoo (configs/unet/fcn_unet_s5-d16_256x256_40k_hrf.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/fcn_unet_s5-d16.py',
 '../_base_/datasets/hrf.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_40k.py']
model = {'test_cfg': {'crop_size': (256, 256), 'stride': (170, 170)}}
evaluation = {'metric': 'mDice'}
