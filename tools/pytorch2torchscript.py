"""Deployment entry kept for reference-name parity (tools/pytorch2torchscript.py).

The TPU-native deployment path does not go through ONNX/TensorRT/
TorchScript: the inference program is AOT-lowered to StableHLO or a
serialized XLA executable. See tools/deployment/export_aot.py (export +
parity check) and tools/deployment/deploy_test.py (evaluation through
the compiled artifact).
"""
import sys

sys.exit(__doc__)
