# Ported from the reference zoo (configs/segformer/segformer_mit-b4_8x1_1024x1024_160k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./segformer_mit-b0_8x1_1024x1024_160k_cityscapes.py']
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b4_20220624-d588d980.pth'
model = {'backbone': {'init_cfg': {'type': 'Pretrained',
                           'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/segformer/mit_b4_20220624-d588d980.pth'},
              'embed_dims': 64,
              'num_layers': [3, 8, 27, 3]},
 'decode_head': {'in_channels': [64, 128, 320, 512]}}
