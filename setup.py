"""Packaging (≙ reference ``setup.py`` — pure python, ext_modules=[])."""
import os.path as osp
import re

from setuptools import find_packages, setup


def get_version():
    with open(osp.join(osp.dirname(__file__), 'stc_unet_tpu',
                       'version.py')) as f:
        return re.search(r"__version__ = '([^']+)'", f.read()).group(1)


setup(
    name='stc_unet_tpu',
    version=get_version(),
    description='TPU-native semantic segmentation framework '
                '(STC-UNet / mmsegmentation capability surface on JAX)',
    long_description=open('README.md').read(),
    long_description_content_type='text/markdown',
    packages=find_packages(exclude=('tests', 'tests.*', 'tools', 'demo')),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'flax', 'optax', 'numpy', 'opencv-python', 'Pillow',
    ],
    extras_require={
        'test': ['pytest'],
    },
    license='Apache License 2.0',
)
