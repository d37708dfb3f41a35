# Ported from the reference zoo (configs/_base_/schedules/schedule_40k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
optimizer = {'type': 'SGD', 'lr': 0.01, 'momentum': 0.9, 'weight_decay': 0.0005}
optimizer_config = {}
lr_config = {'policy': 'poly', 'power': 0.9, 'min_lr': 0.0001, 'by_epoch': False}
runner = {'type': 'IterBasedRunner', 'max_iters': 40000}
checkpoint_config = {'by_epoch': False, 'interval': 4000}
evaluation = {'interval': 4000, 'metric': 'mIoU', 'pre_eval': True}
