# Ported from the reference zoo (configs/segmenter/segmenter_vit-s_linear_8x1_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = './segmenter_vit-s_mask_8x1_512x512_160k_ade20k.py'
model = {'decode_head': {'_delete_': True,
                 'type': 'FCNHead',
                 'in_channels': 384,
                 'channels': 384,
                 'num_convs': 0,
                 'dropout_ratio': 0.0,
                 'concat_input': False,
                 'num_classes': 150,
                 'loss_decode': {'type': 'CrossEntropyLoss',
                                 'use_sigmoid': False,
                                 'loss_weight': 1.0}}}
