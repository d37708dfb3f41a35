_base_ = [
    '../_base_/models/fpn_poolformer_s12.py',
    '../_base_/datasets/ade20k.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_40k.py',
]
model = dict(decode_head=dict(num_classes=150))
data = dict(samples_per_gpu=4, workers_per_gpu=4)
