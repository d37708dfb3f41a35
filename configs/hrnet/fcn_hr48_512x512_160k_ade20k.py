# Ported from the reference zoo (configs/hrnet/fcn_hr48_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './fcn_hr18_512x512_160k_ade20k.py'
model = {'pretrained': 'open-mmlab://msra/hrnetv2_w48',
 'backbone': {'extra': {'stage2': {'num_channels': (48, 96)},
                        'stage3': {'num_channels': (48, 96, 192)},
                        'stage4': {'num_channels': (48, 96, 192, 384)}}},
 'decode_head': {'in_channels': [48, 96, 192, 384], 'channels': 720}}
