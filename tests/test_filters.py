"""SOR / radius outlier filters vs numpy brute-force oracles."""

import numpy as np

from treelearn_tpu.ops.filters import rad_filter, sor_filter


def _cloud_with_outliers(seed=0):
    rng = np.random.default_rng(seed)
    dense = rng.normal(0, 0.3, (400, 3))
    outliers = rng.uniform(5, 8, (12, 3)) * np.sign(rng.normal(size=(12, 3)))
    return np.vstack([dense, outliers]).astype(np.float32)


def test_sor_filter_drops_isolated_points():
    pts = _cloud_with_outliers()
    keep = sor_filter(pts, n_neigh_sor=16, multiplier_sor=1.0)
    assert keep[:400].mean() > 0.95   # dense core survives
    assert not keep[400:].any()       # far outliers dropped

    # oracle: mean distance to 16 NN (self included), global mean + 1 std
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    mean_d = np.sqrt(np.sort(d2, axis=1)[:, :16]).mean(axis=1)
    want = mean_d < mean_d.mean() + 1.0 * mean_d.std(ddof=1)
    np.testing.assert_array_equal(keep, want)


def test_rad_filter_matches_neighbor_count_oracle():
    pts = _cloud_with_outliers(seed=1)
    rad, npoints = 0.5, 8
    keep = rad_filter(pts, rad=rad, npoints_rad=npoints)

    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    counts = (d2 <= rad * rad).sum(axis=1)  # self included
    want = counts >= npoints
    np.testing.assert_array_equal(keep, want)
    assert not keep[400:].any()


def test_rad_filter_tiny_cloud():
    pts = np.zeros((3, 3), np.float32)
    assert rad_filter(pts, rad=1.0, npoints_rad=5).sum() == 0
    assert rad_filter(pts, rad=1.0, npoints_rad=3).all()
