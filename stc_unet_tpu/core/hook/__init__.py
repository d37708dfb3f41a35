"""Hook surface (≙ reference ``mmseg/core/hook/__init__.py``).

The wandb logger hook lives with the other runner hooks in
``stc_unet_tpu/engine/extra_hooks.py``; this subpackage re-exports it so
reference user code importing ``mmseg.core.hook.MMSegWandbHook`` works
verbatim. Absolute import: must be import-safe under both package names.
"""
from stc_unet_tpu.engine.extra_hooks import MMSegWandbHook

__all__ = ['MMSegWandbHook']
