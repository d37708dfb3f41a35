# Ported from the reference zoo (configs/unet/deeplabv3_unet_s5-d16_128x128_40k_chase_db1.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/deeplabv3_unet_s5-d16.py',
 '../_base_/datasets/chase_db1.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_40k.py']
model = {'test_cfg': {'crop_size': (128, 128), 'stride': (85, 85)}}
evaluation = {'metric': 'mDice'}
