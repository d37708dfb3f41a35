# Ported from the reference zoo (configs/twins/twins_svt-s_fpn_fpnhead_8x4_512x512_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/twins_pcpvt-s_fpn.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_small_20220308-7e1c3695.pth'
model = {'backbone': {'type': 'SVT',
              'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/twins/alt_gvt_small_20220308-7e1c3695.pth'},
              'embed_dims': [64, 128, 256, 512],
              'num_heads': [2, 4, 8, 16],
              'mlp_ratios': [4, 4, 4, 4],
              'depths': [2, 2, 10, 4],
              'windiow_sizes': [7, 7, 7, 7],
              'norm_after_stage': True},
 'neck': {'in_channels': [64, 128, 256, 512],
          'out_channels': 256,
          'num_outs': 4},
 'decode_head': {'num_classes': 150}}
optimizer = {'_delete_': True, 'type': 'AdamW', 'lr': 0.0001, 'weight_decay': 0.0001}
