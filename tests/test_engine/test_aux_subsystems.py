"""Aux-subsystem tests (SURVEY §5): profiler hook, wandb hook (mocked),
collect_env/set_env, seed utilities, find_latest_checkpoint auto-resume
scan."""
import logging
import os
import sys
import types

import numpy as np
import pytest


class _Buf:
    def __init__(self):
        self.output = {}
        self.ready = False
        self.val_history = {}
        self.n_history = {}

    def clear(self):
        self.output = {}

    def average(self, n=0):
        self.ready = True


class _Runner:
    iter = 0
    epoch = 0
    inner_iter = 0
    max_iters = 100
    max_epochs = 1
    work_dir = None
    meta = None
    mode = 'train'
    logger = logging.getLogger('aux-test')

    def __init__(self, tmp):
        self.work_dir = str(tmp)
        self.log_buffer = _Buf()


def test_jax_profiler_hook_writes_trace(tmp_path):
    from stc_unet_tpu.engine.extra_hooks import JaxProfilerHook
    hook = JaxProfilerHook(start_iter=1, num_iters=1,
                           log_dir=str(tmp_path / 'prof'))
    runner = _Runner(tmp_path)
    import jax.numpy as jnp
    for it in range(3):
        runner.iter = it
        hook.before_train_iter(runner)
        float(jnp.sum(jnp.ones((8, 8))))  # some device work
        hook.after_train_iter(runner)
    files = [str(p) for p in (tmp_path / 'prof').rglob('*') if p.is_file()]
    assert files, 'profiler hook produced no trace artifacts'


def test_wandb_hook_with_mocked_module(tmp_path, monkeypatch):
    calls = {'init': 0, 'log': []}
    fake = types.ModuleType('wandb')
    fake.init = lambda **kw: calls.__setitem__('init', calls['init'] + 1)
    fake.log = lambda d, **kw: calls['log'].append(d)
    fake.finish = lambda: None
    monkeypatch.setitem(sys.modules, 'wandb', fake)
    from stc_unet_tpu.engine.extra_hooks import MMSegWandbHook
    hook = MMSegWandbHook(init_kwargs=dict(project='t'), interval=1)
    runner = _Runner(tmp_path)
    hook.before_run(runner)
    runner.log_buffer.output = {'loss': 1.0}
    runner.log_buffer.ready = True
    runner.iter = 0
    hook.after_train_iter(runner)
    hook.after_run(runner)
    assert calls['init'] == 1
    assert calls['log'], 'wandb.log never called'


def test_collect_env_and_setup_multi_processes():
    from stc_unet_tpu.utils import collect_env, setup_multi_processes
    env = collect_env()
    assert any('jax' in str(k).lower() or 'jax' in str(v).lower()
               for k, v in env.items()), env
    setup_multi_processes(dict(data=dict(workers_per_gpu=1)))  # no crash


def test_seed_utils_deterministic():
    from stc_unet_tpu.apis import init_random_seed, set_random_seed
    assert init_random_seed(42) == 42
    s = init_random_seed(None)
    assert 0 <= s < 2 ** 31
    set_random_seed(7, deterministic=True)
    a = np.random.rand(3)
    set_random_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_find_latest_checkpoint_scan(tmp_path):
    from stc_unet_tpu.utils import find_latest_checkpoint
    assert find_latest_checkpoint(str(tmp_path / 'nope')) is None
    (tmp_path / 'epoch_1.ckpt').write_bytes(b'x')
    (tmp_path / 'epoch_3.ckpt').write_bytes(b'x')
    (tmp_path / 'epoch_2.ckpt').write_bytes(b'x')
    found = find_latest_checkpoint(str(tmp_path))
    assert found.endswith('epoch_3.ckpt')
    # latest symlink/file wins when present
    (tmp_path / 'latest.ckpt').write_bytes(b'x')
    assert find_latest_checkpoint(str(tmp_path)).endswith('latest.ckpt')
