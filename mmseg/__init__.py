"""Compatibility alias package: reference code imports ``mmseg.*``
(e.g. ``from mmseg.apis import inference_segmentor``); this package
re-exports the TPU-native implementation so those imports work verbatim.

Every ``mmseg.X[.Y...]`` module is the *same object* as
``stc_unet_tpu.X[.Y...]`` — not a re-executed copy. This matters: a fresh
execution of e.g. ``mmseg.models.builder`` would create new ``Registry``
instances, so user code registering a custom head through the mmseg name
would register into a dead registry. Two mechanisms guarantee identity:

1. every already-imported ``stc_unet_tpu.*`` submodule (the package imports
   its full tree eagerly, mmseg-style) is aliased into ``sys.modules``;
2. a meta-path finder catches any straggler ``mmseg.*`` import and returns
   the canonical module instead of re-executing it from disk.
"""
import importlib
import importlib.abc
import importlib.machinery
import sys

import stc_unet_tpu
from stc_unet_tpu import apis, core, datasets, engine, models, ops, utils
from stc_unet_tpu.version import __version__, digit_version, version_info

_CANON = 'stc_unet_tpu'

# 1. alias the whole eagerly-imported tree
for _k in [k for k in sys.modules if k == _CANON or
           k.startswith(_CANON + '.')]:
    _alias = 'mmseg' + _k[len(_CANON):]
    if _alias != 'mmseg':  # this module is the mmseg root
        sys.modules.setdefault(_alias, sys.modules[_k])


class _AliasLoader(importlib.abc.Loader):
    """Return the canonical module; restore the metadata the import
    machinery overwrites (``module_from_spec`` re-inits __name__ etc.)."""

    def __init__(self, canonical):
        self._canonical = canonical
        self._saved = {k: canonical.__dict__.get(k)
                       for k in ('__name__', '__spec__', '__loader__',
                                 '__package__', '__path__')}

    def create_module(self, spec):
        return self._canonical

    def exec_module(self, module):
        for k, v in self._saved.items():
            if v is not None:
                module.__dict__[k] = v


class _AliasFinder(importlib.abc.MetaPathFinder):
    """Resolve any residual ``mmseg.X`` import to ``stc_unet_tpu.X``."""

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith('mmseg.'):
            return None
        real = _CANON + fullname[len('mmseg'):]
        try:
            canonical = importlib.import_module(real)
        except ModuleNotFoundError as e:
            # only "the canonical module doesn't exist" maps to
            # mmseg-name-not-found; a missing DEPENDENCY inside a real
            # canonical module must surface as itself, not be masked as
            # 'No module named mmseg.X'
            if e.name == real or real.startswith(f'{e.name}.'):
                return None
            raise
        return importlib.machinery.ModuleSpec(
            fullname, _AliasLoader(canonical),
            is_package=hasattr(canonical, '__path__'))


sys.meta_path.insert(0, _AliasFinder())

__all__ = ['__version__', 'version_info', 'digit_version', 'apis', 'core',
           'datasets', 'engine', 'models', 'ops', 'utils']
