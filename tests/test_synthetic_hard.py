"""Hard-mode synthetic forest generator (VERDICT r2 item 4) unit tests."""

import os.path as osp

import numpy as np
import pytest

from treelearn_tpu.data.synthetic import (
    make_synthetic_forest,
    make_synthetic_forest_hard,
)


@pytest.fixture(scope="module")
def hard_forest():
    return make_synthetic_forest_hard(
        n_trees=16, extent=30.0, points_per_tree=4000, ground_points=30000,
        seed=3)


def test_labels_and_shape(hard_forest):
    data, pos = hard_forest
    assert data.shape[1] == 4
    labels = data[:, 3].astype(int)
    n_trees = labels.max()
    assert n_trees == len(pos) == 16
    # every instance survives the scan simulation with a usable point count
    for t in range(1, n_trees + 1):
        assert (labels == t).sum() >= 200
    # non-tree clutter exists (ground + understory shrubs)
    assert (labels == 0).sum() > 5000


def test_crowns_interlock(hard_forest):
    """At least one pair of trees must have overlapping crown extents —
    the property the easy generator's 2.5 m min spacing rules out."""
    data, pos = hard_forest
    labels = data[:, 3].astype(int)
    boxes = []
    for t in range(1, labels.max() + 1):
        xy = data[labels == t, :2]
        boxes.append((xy.min(0), xy.max(0)))
    overlaps = 0
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            lo = np.maximum(boxes[i][0], boxes[j][0])
            hi = np.minimum(boxes[i][1], boxes[j][1])
            if (hi - lo > 0.5).all():
                overlaps += 1
    assert overlaps >= 3, f"only {overlaps} interlocking crown pairs"


def test_density_gradient():
    """Ground density (pts per 1 m^2 cell) must fall with range to the
    nearest simulated scanner — area-fair comparison over grid cells."""
    extent = 50.0
    data, _ = make_synthetic_forest_hard(
        n_trees=8, extent=extent, points_per_tree=2000,
        ground_points=120000, n_shrubs=0, seed=5)
    labels = data[:, 3].astype(int)
    g = data[labels == 0, :2]
    # the generator's scanner layout (serpentine)
    n_s = 6
    ty = np.linspace(5.0, extent - 5.0, n_s)
    tx = np.where(np.arange(n_s) % 2 == 0, extent * 0.25, extent * 0.75)
    scanners = np.column_stack([tx, ty])

    cells = np.floor(g).astype(int)
    key = cells[:, 0] * 1000 + cells[:, 1]
    uniq, counts = np.unique(key, return_counts=True)
    centers = np.column_stack([uniq // 1000 + 0.5, uniq % 1000 + 0.5])
    rng_cell = np.min(np.linalg.norm(
        centers[:, None, :] - scanners[None, :, :], axis=-1), axis=1)
    near = counts[rng_cell < 8].mean()
    far = counts[rng_cell > 16].mean()
    assert near / far > 1.5, f"near {near:.1f} vs far {far:.1f} pts/cell"


def test_understory_near_trunks(hard_forest):
    """Some non-tree points must sit 1-3 m from a trunk above the ground
    surface (shrub clutter), not just on the terrain."""
    data, pos = hard_forest
    labels = data[:, 3].astype(int)
    nt = data[labels == 0]
    # points at least 0.5 m above the local terrain mean
    elevated = nt[nt[:, 2] > np.median(nt[:, 2]) + 0.5]
    assert len(elevated) > 500


def test_partition_summary_perfect_prediction(tmp_path, hard_forest):
    from treelearn_tpu.train.selftrain import (
        detection_f1_from_pointwise,
        segmentation_partition_summary,
    )

    data, _ = hard_forest
    pw = osp.join(str(tmp_path), "pointwise_results.npz")
    np.savez(pw, coords=data[:, :3],
             instance_labels=data[:, 3].astype(np.int64),
             instance_preds=data[:, 3].astype(np.int64))
    q = detection_f1_from_pointwise(pw)
    assert q["f1_score"] == 100.0
    p = segmentation_partition_summary(pw)
    assert p["xy_partition_mean_iou"] > 95.0
    assert p["z_partition_mean_iou"] > 95.0


def test_partition_summary_detects_merge(tmp_path, hard_forest):
    """Merging two instances must depress the z partition mean (the merged
    tree's points overlap every normalized-height layer; the xy partition is
    blind to it by protocol — points beyond the 5th-most-distant tree point
    fall outside every ring, reference eval.py:146-160)."""
    from treelearn_tpu.train.selftrain import segmentation_partition_summary

    data, _ = hard_forest
    preds = data[:, 3].astype(np.int64).copy()
    preds[preds == 2] = 1  # undersegmentation
    pw = osp.join(str(tmp_path), "pointwise_results.npz")
    np.savez(pw, coords=data[:, :3],
             instance_labels=data[:, 3].astype(np.int64),
             instance_preds=preds)
    p = segmentation_partition_summary(pw)
    assert p["z_partition_mean_iou"] < 99.0
