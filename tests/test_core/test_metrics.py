"""Golden-value metric tests (≙ reference ``tests/test_metrics.py``: an
independent confusion-matrix reimplementation verifies the histogram math)."""
import numpy as np
import pytest

from stc_unet_tpu.core import (eval_metrics, intersect_and_union, mean_dice,
                               mean_fscore, mean_iou, pre_eval_to_metrics)


def get_confusion_matrix(pred_label, label, num_classes, ignore_index):
    """Independent reimplementation: dense confusion matrix."""
    mask = (label != ignore_index)
    pred_label = pred_label[mask]
    label = label[mask]
    n = num_classes
    inds = n * label + pred_label
    mat = np.bincount(inds, minlength=n**2).reshape(n, n)
    return mat


def legacy_mean_iou(results, gt_seg_maps, num_classes, ignore_index):
    total_mat = np.zeros((num_classes, num_classes), dtype=np.float64)
    for res, gt in zip(results, gt_seg_maps):
        total_mat += get_confusion_matrix(res, gt, num_classes, ignore_index)
    all_acc = np.diag(total_mat).sum() / total_mat.sum()
    acc = np.diag(total_mat) / total_mat.sum(axis=1)
    iou = np.diag(total_mat) / (
        total_mat.sum(axis=1) + total_mat.sum(axis=0) - np.diag(total_mat))
    return all_acc, acc, iou


def legacy_mean_dice(results, gt_seg_maps, num_classes, ignore_index):
    total_mat = np.zeros((num_classes, num_classes), dtype=np.float64)
    for res, gt in zip(results, gt_seg_maps):
        total_mat += get_confusion_matrix(res, gt, num_classes, ignore_index)
    all_acc = np.diag(total_mat).sum() / total_mat.sum()
    acc = np.diag(total_mat) / total_mat.sum(axis=1)
    dice = 2 * np.diag(total_mat) / (
        total_mat.sum(axis=1) + total_mat.sum(axis=0))
    return all_acc, acc, dice


def test_mean_iou_golden():
    rng = np.random.RandomState(0)
    num_classes, ignore_index = 19, 255
    results = [rng.randint(0, num_classes, size=(32, 32)) for _ in range(4)]
    gts = [rng.randint(0, num_classes, size=(32, 32)) for _ in range(4)]
    gts[0][:4] = ignore_index
    ret = eval_metrics(results, gts, num_classes, ignore_index,
                       metrics=['mIoU'])
    all_acc, acc, iou = legacy_mean_iou(results, gts, num_classes,
                                        ignore_index)
    np.testing.assert_allclose(ret['aAcc'], all_acc, rtol=1e-6)
    np.testing.assert_allclose(ret['Acc'], acc, rtol=1e-6)
    np.testing.assert_allclose(ret['IoU'], iou, rtol=1e-6)


def test_mean_dice_golden():
    rng = np.random.RandomState(1)
    num_classes, ignore_index = 5, 255
    results = [rng.randint(0, num_classes, size=(16, 16)) for _ in range(3)]
    gts = [rng.randint(0, num_classes, size=(16, 16)) for _ in range(3)]
    ret = eval_metrics(results, gts, num_classes, ignore_index,
                       metrics=['mDice'])
    all_acc, acc, dice = legacy_mean_dice(results, gts, num_classes,
                                          ignore_index)
    np.testing.assert_allclose(ret['aAcc'], all_acc, rtol=1e-6)
    np.testing.assert_allclose(ret['Acc'], acc, rtol=1e-6)
    np.testing.assert_allclose(ret['Dice'], dice, rtol=1e-6)


def test_mean_fscore():
    rng = np.random.RandomState(2)
    num_classes, ignore_index = 3, 255
    results = [rng.randint(0, num_classes, size=(16, 16))]
    gts = [rng.randint(0, num_classes, size=(16, 16))]
    ret = eval_metrics(results, gts, num_classes, ignore_index,
                       metrics=['mFscore'])
    prec, rec = ret['Precision'], ret['Recall']
    expected_f = 2 * prec * rec / (prec + rec)
    np.testing.assert_allclose(ret['Fscore'], expected_f, rtol=1e-6)


def test_pre_eval_consistency():
    """pre_eval accumulation path must equal the direct path."""
    rng = np.random.RandomState(3)
    num_classes, ignore_index = 4, 255
    results = [rng.randint(0, num_classes, size=(8, 8)) for _ in range(5)]
    gts = [rng.randint(0, num_classes, size=(8, 8)) for _ in range(5)]
    direct = eval_metrics(results, gts, num_classes, ignore_index,
                          metrics=['mIoU', 'mDice'])
    pre = [intersect_and_union(r, g, num_classes, ignore_index)
           for r, g in zip(results, gts)]
    accum = pre_eval_to_metrics(pre, metrics=['mIoU', 'mDice'])
    for k in direct:
        np.testing.assert_allclose(direct[k], accum[k], rtol=1e-6)


def test_binary_perfect_prediction():
    gt = np.zeros((8, 8), np.uint8)
    gt[2:6, 2:6] = 1
    ret = eval_metrics([gt.copy()], [gt], 2, 255,
                       metrics=['mIoU', 'mDice', 'mFscore'])
    np.testing.assert_allclose(ret['IoU'], [1.0, 1.0])
    np.testing.assert_allclose(ret['Dice'], [1.0, 1.0])
    np.testing.assert_allclose(ret['Fscore'], [1.0, 1.0])
    assert ret['aAcc'] == 1.0


def test_reduce_zero_label_and_label_map():
    pred = np.array([[0, 1], [1, 0]])
    gt = np.array([[1, 2], [2, 1]])  # zero-reduced → [[0,1],[1,0]]
    a_i, a_u, a_p, a_l = intersect_and_union(pred, gt, 2, 255,
                                             reduce_zero_label=True)
    np.testing.assert_array_equal(a_i, [2, 2])
    # label_map remap 2→0 (applied before reduction in reference order)
    a_i2, *_ = intersect_and_union(pred, gt, 2, 255, label_map={1: 2})
    assert a_i2.shape == (2,)


def test_nan_to_num():
    # class 2 absent everywhere → IoU NaN → replaced
    pred = np.zeros((4, 4), int)
    gt = np.zeros((4, 4), int)
    ret = eval_metrics([pred], [gt], 3, 255, metrics=['mIoU'], nan_to_num=-1)
    assert ret['IoU'][1] == -1 and ret['IoU'][2] == -1


def test_wrong_metric_raises():
    with pytest.raises(KeyError):
        eval_metrics([np.zeros((2, 2), int)], [np.zeros((2, 2), int)], 2, 255,
                     metrics=['mDice2'])


def test_mean_wrappers():
    rng = np.random.RandomState(4)
    results = [rng.randint(0, 3, size=(8, 8))]
    gts = [rng.randint(0, 3, size=(8, 8))]
    assert 'IoU' in mean_iou(results, gts, 3, 255)
    assert 'Dice' in mean_dice(results, gts, 3, 255)
    assert 'Fscore' in mean_fscore(results, gts, 3, 255)
