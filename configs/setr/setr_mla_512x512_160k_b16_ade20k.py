# Ported from the reference zoo (configs/setr/setr_mla_512x512_160k_b16_ade20k.py) via Config round-trip;
# semantic 1:1 data port so reference configs keep working.
_base_ = ['./setr_mla_512x512_160k_b8_ade20k.py']
data = {'samples_per_gpu': 2}
