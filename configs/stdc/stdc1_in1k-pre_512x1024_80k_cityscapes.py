# Ported from the reference zoo (configs/stdc/stdc1_in1k-pre_512x1024_80k_cityscapes.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
checkpoint = 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc1_20220308-5368626c.pth'
_base_ = './stdc1_512x1024_80k_cityscapes.py'
model = {'backbone': {'backbone_cfg': {'init_cfg': {'type': 'Pretrained',
                                            'checkpoint': 'https://download.openmmlab.com/mmsegmentation/v0.5/pretrain/stdc/stdc1_20220308-5368626c.pth'}}}}
