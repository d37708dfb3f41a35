"""stc_unet_tpu: a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework.

A ground-up rebuild of the capabilities of the STC-UNet fork of
mmsegmentation v0.29 (reference at /root/reference), designed TPU-first:
NHWC flax models compiled with jit/pjit over device meshes, Pallas kernels
for hot ops, orbax checkpointing, and a config/registry system that loads
the reference's python config files verbatim.
"""
import os as _os

from .version import __version__, version_info


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the big models here take minutes to
    compile; caching makes every process after the first start instantly.

    Opt-IN via STC_UNET_TPU_COMP_CACHE=1: on the tunneled 'axon' TPU
    platform, deserializing cached executables has been observed to hang,
    so the cache stays off unless explicitly requested.
    """
    if not _os.environ.get('STC_UNET_TPU_COMP_CACHE'):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            _os.path.expanduser('~/.cache/stc_unet_tpu_xla'))
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

__all__ = ['__version__', 'version_info']
