# Ported from the reference zoo (configs/unet/fcn_unet_s5-d16_ce-1.0-dice-3.0_256x256_40k_hrf.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fcn_unet_s5-d16_256x256_40k_hrf.py'
model = {'decode_head': {'loss_decode': [{'type': 'CrossEntropyLoss',
                                  'loss_name': 'loss_ce',
                                  'loss_weight': 1.0},
                                 {'type': 'DiceLoss',
                                  'loss_name': 'loss_dice',
                                  'loss_weight': 3.0}]}}
