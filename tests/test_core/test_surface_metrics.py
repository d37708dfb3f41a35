"""Surface metric tests with analytically-known values."""
import numpy as np
import pytest

from stc_unet_tpu.core.evaluation.surface_metrics import (
    average_surface_distance, hausdorff_distance, hd95, overlap_ratio,
    relative_volume_difference, surface_metrics)


def _square(y0, y1, x0, x1, size=32):
    m = np.zeros((size, size), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_identical_masks_zero_distance():
    m = _square(8, 24, 8, 24)
    assert hausdorff_distance(m, m) == 0.0
    assert average_surface_distance(m, m) == 0.0
    assert relative_volume_difference(m, m) == 0.0
    assert overlap_ratio(m, m) == 1.0


def test_shifted_square_hd():
    a = _square(8, 16, 8, 16)
    b = _square(8, 16, 12, 20)  # shifted 4 right
    hd = hausdorff_distance(a, b)
    assert 3.9 <= hd <= 4.1


def test_rvd_sign():
    small = _square(8, 16, 8, 16)
    big = _square(8, 20, 8, 16)
    assert relative_volume_difference(big, small) > 0
    assert relative_volume_difference(small, big) < 0


def test_empty_mask_nan():
    m = _square(8, 16, 8, 16)
    empty = np.zeros_like(m)
    assert np.isnan(hausdorff_distance(empty, m))
    assert np.isnan(relative_volume_difference(m, empty))


def test_surface_metrics_dict():
    a = _square(8, 16, 8, 16)
    b = _square(9, 17, 8, 16)
    out = surface_metrics(a, b)
    assert set(out) == {'HD', 'HD95', 'ASSD', 'RVD', 'VOE'}
    assert all(np.isfinite(v) for v in out.values())
    assert out['HD95'] <= out['HD'] + 1e-9
