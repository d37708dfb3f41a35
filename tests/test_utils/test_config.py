"""Config system tests (≙ reference tests/test_config.py scope for loading)."""
import os.path as osp
import tempfile

import pytest

from stc_unet_tpu.utils import Config, ConfigDict


def _write(tmpdir, name, text):
    path = osp.join(tmpdir, name)
    with open(path, 'w') as f:
        f.write(text)
    return path


def test_attribute_access():
    cfg = Config(dict(model=dict(type='EncoderDecoder', depth=50), lr=0.01))
    assert cfg.model.type == 'EncoderDecoder'
    assert cfg['model']['depth'] == 50
    assert cfg.lr == 0.01
    cfg.model.depth = 101
    assert cfg.model.depth == 101
    with pytest.raises(AttributeError):
        _ = cfg.model.missing


def test_fromfile_flat():
    with tempfile.TemporaryDirectory() as d:
        path = _write(d, 'a.py', "x = 1\nmodel = dict(type='Foo', k=[1, 2])\n")
        cfg = Config.fromfile(path)
        assert cfg.x == 1
        assert cfg.model.k == [1, 2]
        assert cfg.filename == path
        assert 'x = 1' in cfg.text


def test_base_inheritance_and_delete():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'base.py',
               "model = dict(type='A', backbone=dict(type='B', depth=18), n=1)\n"
               "opt = dict(type='SGD', lr=0.1)\n")
        child = _write(d, 'child.py',
                       "_base_ = './base.py'\n"
                       "model = dict(backbone=dict(depth=50))\n"
                       "opt = dict(_delete_=True, type='Adam')\n")
        cfg = Config.fromfile(child)
        assert cfg.model.type == 'A'            # inherited
        assert cfg.model.backbone.depth == 50   # overridden
        assert cfg.model.backbone.type == 'B'   # merged, not replaced
        assert cfg.model.n == 1
        assert cfg.opt == dict(type='Adam')     # _delete_ replaces wholesale


def test_multi_base():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'm.py', "model = dict(type='M')\n")
        _write(d, 's.py', "schedule = dict(lr=0.1)\n")
        child = _write(d, 'c.py', "_base_ = ['./m.py', './s.py']\nextra = 2\n")
        cfg = Config.fromfile(child)
        assert cfg.model.type == 'M' and cfg.schedule.lr == 0.1 and cfg.extra == 2


def test_merge_from_dict():
    cfg = Config(dict(model=dict(backbone=dict(depth=18)), lr=0.1))
    cfg.merge_from_dict({'model.backbone.depth': 50, 'lr': 0.2, 'new': 7})
    assert cfg.model.backbone.depth == 50
    assert cfg.lr == 0.2
    assert cfg.new == 7


def test_pretty_text_roundtrip():
    cfg = Config(dict(model=dict(type='X', k=(1, 2)), names=['a', 'b']))
    cfg2 = Config.fromstring(cfg.pretty_text)
    assert cfg2.model.type == 'X'
    assert list(cfg2.names) == ['a', 'b']


def test_reference_configs_load():
    """All nine reference my_config files must load through our Config."""
    ref_dir = '/root/reference/my_config'
    if not osp.isdir(ref_dir):
        pytest.skip('reference not mounted')
    import glob
    files = sorted(glob.glob(osp.join(ref_dir, '*.py')))
    assert len(files) >= 9
    for f in files:
        cfg = Config.fromfile(f)
        assert 'model' in cfg and 'data' in cfg
        assert cfg.model.type in ('EncoderDecoder', 'EncoderDecoderFull')


def test_configdict_deepcopy():
    import copy
    cfg = ConfigDict(dict(a=dict(b=[1, 2])))
    cfg2 = copy.deepcopy(cfg)
    cfg2.a.b.append(3)
    assert cfg.a.b == [1, 2]
