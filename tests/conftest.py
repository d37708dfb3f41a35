"""Test-wide environment: run all tests on CPU with 8 virtual devices.

This is the TPU-native answer to the reference's approach of testing
distributed paths via monkeypatching (reference
``tests/test_models/test_eval_hook.py:118-128``): we instead create a real
8-device mesh on host CPU so pjit/shard_map collective code paths execute
for real in CI.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
