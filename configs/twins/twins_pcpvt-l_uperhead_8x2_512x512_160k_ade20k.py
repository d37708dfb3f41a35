# Ported from the reference zoo (configs/twins/twins_pcpvt-l_uperhead_8x2_512x512_160k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./twins_pcpvt-s_uperhead_8x4_512x512_160k_ade20k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/pcpvt_large_20220308-37579dc6.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/pcpvt_large_20220308-37579dc6.pth'},
              'depths': [3, 8, 27, 3],
              'drop_path_rate': 0.3}}
data = {'samples_per_gpu': 2, 'workers_per_gpu': 2}
