"""stc_unet_tpu: a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework.

A ground-up rebuild of the capabilities of the STC-UNet fork of
mmsegmentation v0.29 (reference at /root/reference), designed TPU-first:
NHWC flax models compiled with jit/pjit over device meshes, Pallas kernels
for hot ops, orbax checkpointing, and a config/registry system that loads
the reference's python config files verbatim.
"""
from .version import __version__, version_info

__all__ = ['__version__', 'version_info']
