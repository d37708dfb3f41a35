# Ported from the reference zoo (configs/_base_/default_runtime.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
log_config = {'interval': 50, 'hooks': [{'type': 'TextLoggerHook', 'by_epoch': False}]}
dist_params = {'backend': 'nccl'}
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
cudnn_benchmark = True
