"""Test APIs (≙ reference ``mmseg/apis/test.py:34,140``)."""
from __future__ import annotations

import os.path as osp
import tempfile
import warnings

import numpy as np


def np2tmp(array, temp_file_name=None, tmpdir=None):
    """Spill an array to a tempfile (reference ``test.py:19``)."""
    if temp_file_name is None:
        temp_file_name = tempfile.NamedTemporaryFile(
            suffix='.npy', delete=False, dir=tmpdir).name
    np.save(temp_file_name, array)
    return temp_file_name


def single_gpu_test(model, data_loader, show=False, out_dir=None,
                    efficient_test=False, opacity=0.5, pre_eval=False,
                    format_only=False, format_args={}):
    """Inference over a loader on the local chip (reference ``test.py:34``).

    Returns seg maps, pre_eval 4-tuples, or formatted file paths depending
    on flags (mutually exclusive, same rules as the reference).
    """
    if efficient_test:
        warnings.warn('efficient_test is deprecated; results are '
                      'accumulated as compact pre_eval areas instead')
    assert [efficient_test, pre_eval, format_only].count(True) <= 1, \
        '``efficient_test``, ``pre_eval`` and ``format_only`` are mutually ' \
        'exclusive'
    model.eval() if hasattr(model, 'eval') else None
    results = []
    dataset = data_loader.dataset
    loader_indices = _batch_indices(data_loader)
    for batch_indices, data in zip(loader_indices, data_loader):
        result = model(return_loss=False, rescale=True, **_as_test_kwargs(data))
        # the loader pads the last batch to full size (static shapes);
        # drop the padded duplicates so results align with the dataset
        if len(result) > len(batch_indices):
            result = result[:len(batch_indices)]
        if show or out_dir:
            _visualize(model, data, result, out_dir, opacity, dataset)
        if format_only:
            result = dataset.format_results(
                result, indices=batch_indices, **format_args)
        if pre_eval:
            result = dataset.pre_eval(result, indices=batch_indices)
        results.extend(result)
    return results


def multi_gpu_test(model, data_loader, tmpdir=None, gpu_collect=False,
                   efficient_test=False, pre_eval=False, format_only=False,
                   format_args={}):
    """Multi-host variant (reference ``test.py:140``): each jax process
    evaluates its loader shard, then the pre_eval area 4-tuples are
    all-gathered across hosts (≙ collect_results_gpu — the payload is tiny:
    4 x num_classes ints per image)."""
    results = single_gpu_test(model, data_loader,
                              efficient_test=efficient_test,
                              pre_eval=pre_eval, format_only=format_only,
                              format_args=format_args)
    import jax
    if pre_eval and jax.process_count() > 1:
        from jax.experimental import multihost_utils
        results = _gather_pre_eval_results(
            results, multihost_utils.process_allgather)
    return results


def _gather_pre_eval_results(results, allgather):
    """All-gather per-host pre_eval 4-tuples, robust to unequal shard sizes.

    ``allgather`` maps a local array of shape S to a stacked (P, *S) array
    (``multihost_utils.process_allgather`` semantics). Hosts may hold
    different numbers of results (the sampler pads-to-divisible, but drop_last
    / uneven datasets can break that): each host pads its stack to the global
    max count, gathers, then masks the padding rows using the gathered
    per-host counts. Reference analog: ``collect_results_gpu``
    (``mmseg/apis/test.py:140`` path)."""
    local = (np.stack([np.stack(r) for r in results]).astype(np.float64)
             if results else None)
    # gather (count, num_classes) so even an empty-shard host can build a
    # shape-agreeing padded stack (allgather requires identical shapes)
    meta = np.asarray([len(results),
                       local.shape[-1] if local is not None else 0])
    metas = np.asarray(allgather(meta)).reshape(-1, 2)
    counts, n_max = metas[:, 0], int(metas[:, 0].max())
    if n_max == 0:
        return []
    num_classes = int(metas[:, 1].max())
    if local is None:
        local = np.zeros((0, 4, num_classes), np.float64)
    pad = np.zeros((n_max - local.shape[0],) + local.shape[1:], local.dtype)
    gathered = np.asarray(allgather(np.concatenate([local, pad], axis=0)))
    out = []
    for proc, n in enumerate(counts.tolist()):
        out.extend(tuple(row) for row in gathered[proc, :int(n)])
    return out


def _batch_indices(data_loader):
    batch_size = getattr(data_loader, 'batch_size', 1)
    n = len(data_loader.dataset)
    for i in range(0, n, batch_size):
        yield list(range(i, min(i + batch_size, n)))


def _as_test_kwargs(data):
    """Collated test batches carry aug-major lists already; train-style
    batches (no TTA) are wrapped into 1-aug lists."""
    img = data['img']
    img_metas = data['img_metas']
    if not isinstance(img, list):
        img = [img]
    if img_metas and not isinstance(img_metas[0], list):
        img_metas = [img_metas]
    return dict(img=img, img_metas=img_metas)


def _visualize(model, data, result, out_dir, opacity, dataset):
    from stc_unet_tpu.utils.image import imdenormalize
    imgs = data['img'][0] if isinstance(data['img'], list) else data['img']
    metas = data['img_metas'][0] if isinstance(data['img_metas'][0], list) \
        else data['img_metas']
    for batch_i, (img, img_meta) in enumerate(zip(imgs, metas)):
        h, w = img_meta['img_shape'][:2]
        img_show = img[:h, :w]
        norm = img_meta.get('img_norm_cfg')
        if norm is not None:
            img_show = imdenormalize(img_show, norm['mean'], norm['std'],
                                     to_bgr=norm.get('to_rgb', False))
        img_show = np.clip(img_show, 0, 255).astype(np.uint8)
        ori_h, ori_w = img_meta['ori_shape'][:-1]
        from stc_unet_tpu.utils.image import imresize
        img_show = imresize(img_show, (ori_w, ori_h))
        out_file = None
        if out_dir:
            out_file = osp.join(out_dir, img_meta.get('ori_filename')
                                or f'{batch_i}.png')
        model.show_result(img_show, [np.asarray(result[batch_i])],
                          palette=getattr(dataset, 'PALETTE', None),
                          show=False, out_file=out_file, opacity=opacity)
