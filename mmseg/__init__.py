"""Compatibility alias package: reference code imports ``mmseg.*``
(e.g. ``from mmseg.apis import inference_segmentor``); this package
re-exports the TPU-native implementation so those imports work verbatim.
"""
import sys

import stc_unet_tpu
from stc_unet_tpu import apis, core, datasets, engine, models, ops, utils
from stc_unet_tpu.version import __version__, digit_version, version_info

# expose submodules under the mmseg namespace
for _name, _mod in [('apis', apis), ('core', core), ('datasets', datasets),
                    ('engine', engine), ('models', models), ('ops', ops),
                    ('utils', utils)]:
    sys.modules[f'mmseg.{_name}'] = _mod

__all__ = ['__version__', 'version_info', 'digit_version', 'apis', 'core',
           'datasets', 'engine', 'models', 'ops', 'utils']
