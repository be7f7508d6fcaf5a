"""Point-cloud denoising filters: statistical and radius outlier removal.

Parity: the reference's crop-denoising knobs (sor_filter / rad_filter,
reference tree_learn/util/data_preparation.py:589-615, backed by Open3D's
remove_statistical_outlier / remove_radius_outlier).  Both are off by default
(sample_generation.yaml:11-15).  Neighbor search runs through the bounded
grid/streaming k-NN engine in ops/cluster.py instead of a host KD-tree.

Semantics mirror Open3D: the query point itself is a member of the cloud and
therefore participates in its own neighborhood (distance 0).
"""

from __future__ import annotations

import numpy as np

from .cluster import grid_knn


def sor_filter(points: np.ndarray, n_neigh_sor: int,
               multiplier_sor: float) -> np.ndarray:
    """Statistical outlier removal mask (True = keep).

    Keep points whose mean distance to their ``n_neigh_sor`` nearest
    neighbors is below ``global_mean + multiplier_sor * global_std``
    (reference data_preparation.py:589-601)."""
    pts = np.asarray(points[:, :3], np.float32)
    assert len(pts) > 0
    k = min(int(n_neigh_sor), len(pts))
    idx = grid_knn(pts, pts, k=k)
    d = np.sqrt(((pts[:, None, :] - pts[idx]) ** 2).sum(-1)).mean(axis=1)
    thr = d.mean() + float(multiplier_sor) * d.std(ddof=1 if len(d) > 1 else 0)
    return d < thr


def rad_filter(points: np.ndarray, rad: float, npoints_rad: int) -> np.ndarray:
    """Radius outlier removal mask (True = keep).

    Keep points with at least ``npoints_rad`` cloud members (including the
    point itself) within ``rad`` — equivalently, whose ``npoints_rad``-th
    nearest neighbor lies within ``rad``
    (reference data_preparation.py:603-615)."""
    pts = np.asarray(points[:, :3], np.float32)
    assert len(pts) > 0
    k = min(int(npoints_rad), len(pts))
    idx = grid_knn(pts, pts, k=k)
    kth_d2 = ((pts - pts[idx[:, -1]]) ** 2).sum(-1)
    keep = kth_d2 <= float(rad) ** 2
    if k < npoints_rad:  # fewer cloud points than required neighbors
        keep[:] = False
    return keep
