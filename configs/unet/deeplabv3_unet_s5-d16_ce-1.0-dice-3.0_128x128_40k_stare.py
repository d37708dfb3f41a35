# Ported from the reference zoo (configs/unet/deeplabv3_unet_s5-d16_ce-1.0-dice-3.0_128x128_40k_stare.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './deeplabv3_unet_s5-d16_128x128_40k_stare.py'
model = {'decode_head': {'loss_decode': [{'type': 'CrossEntropyLoss',
                                  'loss_name': 'loss_ce',
                                  'loss_weight': 1.0},
                                 {'type': 'DiceLoss',
                                  'loss_name': 'loss_dice',
                                  'loss_weight': 3.0}]}}
