# Ported from the reference zoo (configs/twins/twins_pcpvt-s_fpn_fpnhead_8x4_512x512_80k_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['../_base_/models/twins_pcpvt-s_fpn.py',
 '../_base_/datasets/ade20k.py',
 '../_base_/default_runtime.py',
 '../_base_/schedules/schedule_80k.py']
optimizer = {'_delete_': True, 'type': 'AdamW', 'lr': 0.0001, 'weight_decay': 0.0001}
