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


def test_hd_and_assd_vs_scipy_oracle():
    """Random blob masks: HD/HD95/ASSD must match a direct scipy EDT
    computation of surface distances."""
    from scipy import ndimage
    rng = np.random.RandomState(3)
    a = np.zeros((24, 24), bool)
    b = np.zeros((24, 24), bool)
    a[4:14, 6:18] = True
    b[7:19, 4:15] = True

    def surface(m):
        er = ndimage.binary_erosion(m)
        return m & ~er

    def dists(src, dst):
        dt = ndimage.distance_transform_edt(~surface(dst))
        return dt[surface(src)]

    d_ab, d_ba = dists(a, b), dists(b, a)
    ref_hd = max(d_ab.max(), d_ba.max())
    ref_assd = (d_ab.sum() + d_ba.sum()) / (len(d_ab) + len(d_ba))

    got_hd = hausdorff_distance(a, b)
    got_assd = average_surface_distance(a, b)
    np.testing.assert_allclose(got_hd, ref_hd, rtol=1e-6)
    np.testing.assert_allclose(got_assd, ref_assd, rtol=1e-6)

    all_d = np.concatenate([d_ab, d_ba])
    ref_hd95 = np.percentile(all_d, 95)
    got_hd95 = hd95(a, b)
    np.testing.assert_allclose(got_hd95, ref_hd95, rtol=1e-6)
