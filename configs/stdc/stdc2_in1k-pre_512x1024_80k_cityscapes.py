# Ported from the reference zoo (configs/stdc/stdc2_in1k-pre_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc2_20220308-7dbd9127.pth'
_base_ = './stdc2_512x1024_80k_cityscapes.py'
model = {'backbone': {'backbone_cfg': {'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc2_20220308-7dbd9127.pth'}}}}
