# Ported from the reference zoo (configs/twins/twins_svt-b_uperhead_8x2_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./twins_svt-s_uperhead_8x2_512x512_160k_ade20k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_base_20220308-1b7eb711.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_base_20220308-1b7eb711.pth'},
              'embed_dims': [96, 192, 384, 768],
              'num_heads': [3, 6, 12, 24],
              'depths': [2, 2, 18, 2]},
 'decode_head': {'in_channels': [96, 192, 384, 768]},
 'auxiliary_head': {'in_channels': 384}}
