"""Test-wide environment: run all tests on CPU with 8 virtual devices.

This is the TPU-native answer to the reference's approach of testing
distributed paths via monkeypatching (reference
``tests/test_models/test_eval_hook.py:118-128``): we instead create a real
8-device mesh on host CPU so pjit/shard_map collective code paths execute
for real in CI.
"""
import os

# Force CPU even when the environment pins JAX to the TPU tunnel (there,
# fp32 convs run in bf16 and golden parity tests would fail). The env var is
# not enough: sitecustomize re-registers the TPU platform, so override the
# config knob after import as well.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compilation cache: re-runs of the suite skip recompiling
# unchanged programs (measured 2.6x on warm test files). This is safe on
# the CPU backend — the cache-READ hang documented in CLAUDE.md is
# specific to the tunneled TPU platform, which conftest never uses.
# Opt out with STC_UNET_TPU_TEST_NO_CACHE=1 (e.g. when bisecting
# compiler-version issues).
if not os.environ.get('STC_UNET_TPU_TEST_NO_CACHE'):
    _cache_dir = os.environ.get(
        'JAX_COMPILATION_CACHE_DIR',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), '.cache', 'jax_test_cache'))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)
