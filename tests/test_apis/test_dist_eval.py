"""Distributed eval correctness: the pre_eval all-gather merges shard-partial
result lists (robust to unequal shards), DistEvalHook routes through
multi_gpu_test, and the cross-host loss-key guard trips on divergence
(reference ``core/evaluation/eval_hooks.py:61,95-100``, ``apis/test.py:140``,
``segmentors/base.py:198-205``)."""
import numpy as np
import pytest

from stc_unet_tpu.apis.test import _gather_pre_eval_results
from stc_unet_tpu.models.segmentors.base import BaseSegmentor


def _fake_allgather(per_process_values):
    """Simulate multihost_utils.process_allgather for P processes: call i
    returns np.stack of what every process passed. Each process's local value
    is supplied up front; the gather function ignores its arg identity and
    stacks the parallel set (shapes must agree, like the real collective)."""
    calls = {'i': 0}

    def allgather(local):
        vals = [np.asarray(v) for v in per_process_values[calls['i']]]
        calls['i'] += 1
        shapes = {v.shape for v in vals}
        assert len(shapes) == 1, f'allgather shape mismatch: {shapes}'
        return np.stack(vals)
    return allgather


def _areas(seed, n, num_classes=3):
    rng = np.random.RandomState(seed)
    return [tuple(rng.randint(0, 100, (4, num_classes)).astype(np.float64))
            for _ in range(n)]


def test_gather_equal_shards():
    a, b = _areas(0, 2), _areas(1, 2)
    # both processes run the same code; simulate process 0's view
    per_call = [
        [np.array([2, 3]), np.array([2, 3])],               # (count, C)
        [np.stack([np.stack(r) for r in a]),
         np.stack([np.stack(r) for r in b])],
    ]
    out = _gather_pre_eval_results(a, _fake_allgather(per_call))
    assert len(out) == 4
    np.testing.assert_array_equal(np.stack(out[0]), np.stack(a[0]))
    np.testing.assert_array_equal(np.stack(out[2]), np.stack(b[0]))


def test_gather_unequal_shards_pads_and_masks():
    a, b = _areas(0, 3), _areas(1, 1)
    pad_b = np.concatenate([np.stack([np.stack(r) for r in b]),
                            np.zeros((2, 4, 3))], axis=0)
    per_call = [
        [np.array([3, 3]), np.array([1, 3])],
        [np.stack([np.stack(r) for r in a]), pad_b],
    ]
    out = _gather_pre_eval_results(a, _fake_allgather(per_call))
    # 3 from process 0 + only 1 (not 3) from process 1: padding masked out
    assert len(out) == 4
    np.testing.assert_array_equal(np.stack(out[3]), np.stack(b[0]))


def test_gather_empty_shard():
    a = _areas(0, 2)
    pad_empty = np.zeros((2, 4, 3))
    per_call = [
        [np.array([2, 3]), np.array([0, 0])],
        [np.stack([np.stack(r) for r in a]), pad_empty],
    ]
    out = _gather_pre_eval_results(a, _fake_allgather(per_call))
    assert len(out) == 2
    np.testing.assert_array_equal(np.stack(out[1]), np.stack(a[1]))


def test_gather_all_empty():
    per_call = [[np.array([0, 0]), np.array([0, 0])]]
    assert _gather_pre_eval_results([], _fake_allgather(per_call)) == []


def test_dist_eval_hook_defaults_to_multi_gpu_test():
    from stc_unet_tpu.apis import multi_gpu_test, single_gpu_test
    from stc_unet_tpu.engine.eval_hooks import DistEvalHook, EvalHook

    class _Loader:
        dataset = None

        def __iter__(self):
            return iter([])

        def __len__(self):
            return 0
    dist_hook = DistEvalHook(_Loader(), interval=1)
    assert dist_hook.test_fn is multi_gpu_test
    assert EvalHook(_Loader(), interval=1).test_fn is single_gpu_test
    # explicit test_fn still wins
    marker = lambda *a, **k: []  # noqa: E731
    assert DistEvalHook(_Loader(), test_fn=marker).test_fn is marker


def test_dist_eval_hook_merges_before_evaluate(tmp_path):
    """Shard-partial results must be merged before dataset.evaluate —
    the hook's test_fn gets the collection responsibility."""
    from stc_unet_tpu.engine.eval_hooks import DistEvalHook

    merged = _areas(0, 2) + _areas(1, 2)
    seen = {}

    class _Dataset:
        def evaluate(self, results, logger=None, **kw):
            seen['n_results'] = len(results)
            return dict(mIoU=0.5)

    class _Loader:
        dataset = _Dataset()

        def __iter__(self):
            return iter([])

        def __len__(self):
            return 4

    class _Buf:
        output = {}
        ready = False

        def clear(self):
            self.output = {}

    class _Runner:
        work_dir = str(tmp_path)
        logger = None
        meta = None
        epoch = 0
        iter = 0
        model = object()

        def _sync_model(self):
            pass
    runner = _Runner()
    runner.log_buffer = _Buf()

    def fake_multi_gpu_test(model, loader, tmpdir=None, gpu_collect=False,
                            pre_eval=False):
        assert pre_eval
        return merged  # already collected across hosts
    hook = DistEvalHook(_Loader(), interval=1, test_fn=fake_multi_gpu_test)
    hook._do_evaluate(runner)
    assert seen['n_results'] == 4


def test_loss_key_consistency_guard():
    log_vars = {'loss_bce': 1.0, 'loss_dice': 2.0}
    ok_gather = lambda x: np.asarray([2, 2])  # noqa: E731
    BaseSegmentor._check_loss_keys_consistent(
        log_vars, allgather=ok_gather, process_count=2)
    bad_gather = lambda x: np.asarray([2, 3])  # noqa: E731
    with pytest.raises(AssertionError, match='different across hosts'):
        BaseSegmentor._check_loss_keys_consistent(
            log_vars, allgather=bad_gather, process_count=2)
