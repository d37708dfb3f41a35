import pytest

from stc_unet_tpu.utils import Registry


def test_register_and_build():
    CATS = Registry('cat')

    @CATS.register_module()
    class Siamese:
        def __init__(self, name='kitty'):
            self.name = name

    assert 'Siamese' in CATS
    obj = CATS.build(dict(type='Siamese', name='bob'))
    assert obj.name == 'bob'
    obj = CATS.build(dict(type='Siamese'), default_args=dict(name='d'))
    assert obj.name == 'd'


def test_duplicate_and_missing():
    R = Registry('r')

    @R.register_module()
    class A:
        pass

    with pytest.raises(KeyError):
        R.register_module(module=A)
    R.register_module(force=True, module=A)
    with pytest.raises(KeyError):
        R.build(dict(type='Nope'))
    with pytest.raises(KeyError):
        R.build(dict(no_type=1))


def test_build_with_class_type():
    R = Registry('r')

    class B:
        def __init__(self, v):
            self.v = v

    obj = R.build(dict(type=B, v=3))
    assert obj.v == 3


def test_parent_lookup():
    parent = Registry('p')
    child = Registry('c', parent=parent)

    @parent.register_module()
    class P:
        pass

    assert child.get('P') is P
