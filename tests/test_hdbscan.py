"""On-device HDBSCAN vs the sklearn oracle.

The device implementation (ops/hdbscan.py) approximates the continuous
mutual-reachability dendrogram with a geometric eps ladder, so comparisons
are ARI / cluster-count based, not exact-label based — matching how the
reference consumes HDBSCAN (instance grouping of well-separated tree bases,
util/pipeline.py:184-191).
"""

import numpy as np
import pytest

from treelearn_tpu.ops.hdbscan import hdbscan_cluster, kth_neighbor_d2


def _ari(a, b):
    from sklearn.metrics import adjusted_rand_score

    return adjusted_rand_score(a, b)


def _blobs(n_blobs, n_per, spread, extent, seed=0, noise=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, extent, (n_blobs, 2))
    pts = np.concatenate(
        [c + rng.normal(0, spread, (n_per, 2)) for c in centers])
    if noise:
        pts = np.concatenate([pts, rng.uniform(0, extent, (noise, 2))])
    return pts.astype(np.float32)


def test_kth_neighbor_d2_matches_brute():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, (500, 2)).astype(np.float32)
    d2 = kth_neighbor_d2(pts, k=8)
    # brute oracle (self-inclusive); grid sampling may overestimate a few
    # dense-cell entries and f32 vs f64 accumulate differently
    full = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    oracle = np.sort(full, axis=1)[:, 7]
    rel = np.abs(d2 - oracle) / np.maximum(oracle, 1e-9)
    assert np.median(rel) < 1e-4
    assert (rel < 0.05).mean() > 0.99
    assert (d2 >= oracle - 1e-4).all()  # sampling only ever overestimates


def test_hdbscan_separated_blobs():
    pts = _blobs(6, 200, 0.3, 60, seed=2, noise=100)
    labels = hdbscan_cluster(pts, min_cluster_size=50)
    from sklearn.cluster import HDBSCAN

    oracle = HDBSCAN(min_cluster_size=50).fit(pts).labels_
    n_ours = len(np.unique(labels[labels > 0]))
    n_oracle = len(np.unique(oracle[oracle >= 0]))
    assert n_ours == n_oracle == 6
    assert _ari(labels, oracle) > 0.95


def test_hdbscan_varying_density():
    # two tight blobs + one loose blob: density-adaptive grouping (the case
    # plain DBSCAN with one eps cannot do)
    rng = np.random.default_rng(3)
    pts = np.concatenate([
        rng.normal((0, 0), 0.2, (300, 2)),
        rng.normal((4, 0), 0.2, (300, 2)),
        rng.normal((30, 30), 3.0, (300, 2)),
    ]).astype(np.float32)
    labels = hdbscan_cluster(pts, min_cluster_size=60)
    from sklearn.cluster import HDBSCAN

    oracle = HDBSCAN(min_cluster_size=60).fit(pts).labels_
    assert _ari(labels, oracle) > 0.9
    assert len(np.unique(labels[labels > 0])) == 3


def test_hdbscan_tree_bases_layout():
    # offset-shifted tree bases: dense clumps on a jittered grid + ground noise
    rng = np.random.default_rng(4)
    bases = []
    for i in range(4):
        for j in range(4):
            c = np.array([10.0 * i, 10.0 * j]) + rng.uniform(-2, 2, 2)
            bases.append(c + rng.normal(0, 0.25, (400, 2)))
    pts = np.concatenate(bases + [rng.uniform(-5, 35, (500, 2))]).astype(np.float32)
    labels = hdbscan_cluster(pts, min_cluster_size=100)
    from sklearn.cluster import HDBSCAN

    oracle = HDBSCAN(min_cluster_size=100).fit(pts).labels_
    n_ours = len(np.unique(labels[labels > 0]))
    n_oracle = len(np.unique(oracle[oracle >= 0]))
    assert n_ours == n_oracle == 16
    assert _ari(labels, oracle) > 0.95


def test_hdbscan_all_noise_when_too_small():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 100, (60, 2)).astype(np.float32)
    labels = hdbscan_cluster(pts, min_cluster_size=100)
    assert (labels == -1).all()


def test_hdbscan_empty():
    assert len(hdbscan_cluster(np.zeros((0, 2), np.float32), 50)) == 0


def test_group_hdbscan_contract():
    from treelearn_tpu.pipeline.instances import group_hdbscan

    pts = _blobs(3, 300, 0.3, 40, seed=6, noise=50)
    labels = group_hdbscan(pts, npoint_thr=100, not_assigned_label=-1,
                           start_num=1)
    tree_ids = np.unique(labels[labels >= 1])
    assert len(tree_ids) == 3
    assert set(tree_ids) == {1, 2, 3}
    assert (labels[labels < 1] == -1).all()


def test_level_components_banded_path_matches_xla(monkeypatch):
    """The TPU ladder path (exact banded CC per level, no seeding) must
    produce the same nested partitions as the CPU/XLA path."""
    import jax
    import numpy as np

    import treelearn_tpu.ops.pallas_cc as pcc
    from treelearn_tpu.ops import hdbscan as hd

    rng = np.random.default_rng(11)
    pts = np.vstack([rng.normal([0, 0], 0.05, (120, 2)),
                     rng.normal([1.5, 0], 0.05, (120, 2)),
                     rng.normal([6, 6], 0.08, (80, 2))]).astype(np.float32)
    core = np.full(len(pts), 0.05, np.float32)
    levels = np.geomspace(0.05, 8.0, 8)

    cpu = hd._level_components(pts, core, levels)

    monkeypatch.setattr(pcc, "_INTERPRET", True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    tpu = hd._level_components(pts, core, levels)

    for li in range(len(levels)):
        a, b = cpu[li], tpu[li]
        assert ((a >= 0) == (b >= 0)).all()
        m = a >= 0
        pairs = set(zip(a[m].tolist(), b[m].tolist()))
        assert len(pairs) == len(set(a[m])) == len(set(b[m]))


# ---- large-N path: grid-quantized weighted HDBSCAN (hdbscan_cluster_large) --


def test_hdbscan_large_matches_sklearn_ari():
    """Quantized weighted formulation vs the sklearn oracle on a forest-like
    layout (trunk blobs + uniform clutter) at a size where quantization is
    genuinely active."""
    from treelearn_tpu.ops.hdbscan import hdbscan_cluster_large
    from sklearn.cluster import HDBSCAN

    pts = _blobs(12, 2000, 0.3, 50, seed=7, noise=6000)
    ours = hdbscan_cluster_large(pts, 50)
    oracle = HDBSCAN(min_cluster_size=50).fit(pts).labels_
    n_ours = len(np.unique(ours[ours >= 0]))
    n_oracle = len(np.unique(oracle[oracle >= 0]))
    # marginal clutter clusters at the size bar may differ; the 12 true
    # blobs must all be found (ARI carries the real agreement signal)
    assert abs(n_ours - n_oracle) <= max(3, int(0.25 * n_oracle))
    big_ours = (np.unique(ours[ours >= 0], return_counts=True)[1] > 1000).sum()
    big_orac = (np.unique(oracle[oracle >= 0], return_counts=True)[1] > 1000).sum()
    assert big_ours == big_orac == 12
    assert _ari(ours, oracle) > 0.9


def test_hdbscan_large_no_quantization_limit():
    """With target_cells >= n the cells ARE the points (weight 1 each) —
    the MST/condensed-tree machinery alone must track sklearn closely."""
    from treelearn_tpu.ops.hdbscan import hdbscan_cluster_large
    from sklearn.cluster import HDBSCAN

    pts = _blobs(6, 600, 0.25, 40, seed=9, noise=800)
    ours = hdbscan_cluster_large(pts, 40, target_cells=len(pts) * 2)
    oracle = HDBSCAN(min_cluster_size=40).fit(pts).labels_
    assert _ari(ours, oracle) > 0.9


def test_hdbscan_large_dispatch_and_contract(monkeypatch):
    """hdbscan_cluster routes >device_max through the large path and keeps
    the public contract: clusters numbered from start_num, noise label."""
    monkeypatch.setenv("TL_HDBSCAN_DEVICE_MAX", "500")
    pts = _blobs(4, 400, 0.2, 30, seed=11, noise=200)
    labels = hdbscan_cluster(pts, min_cluster_size=60,
                             not_assigned_label=-7, start_num=3)
    pos = labels[labels != -7]
    assert set(np.unique(labels)) <= set([-7] + list(range(3, 3 + 64)))
    assert pos.min() >= 3
    # every returned cluster clears the size bar
    _, counts = np.unique(pos, return_counts=True)
    assert (counts >= 60).all()


def test_hdbscan_large_degenerate_coincident():
    from treelearn_tpu.ops.hdbscan import hdbscan_cluster_large

    pts = np.zeros((500, 2), np.float32)
    labels = hdbscan_cluster_large(pts, 50)
    assert (labels == 0).all()
    labels = hdbscan_cluster_large(pts, 600)  # below the size bar
    assert (labels == -1).all()


def test_hdbscan_large_weighted_core_distance_oracle():
    """Weighted k-th-neighbor distance equals the unweighted k-th neighbor
    computed on the replicated point set."""
    from treelearn_tpu.ops.hdbscan import _weighted_core_distance

    rng = np.random.default_rng(3)
    cells = rng.uniform(0, 10, (300, 2)).astype(np.float32)
    w = rng.integers(1, 5, 300).astype(np.float64)
    k = 9
    core = _weighted_core_distance(cells, w, k)
    # oracle: replicate each cell w times, take k-th NN distance
    rep = np.repeat(cells, w.astype(int), axis=0)
    full = np.sqrt(((cells[:, None, :] - rep[None, :, :]) ** 2).sum(-1))
    oracle = np.sort(full, axis=1)[:, k - 1]
    np.testing.assert_allclose(core, oracle, rtol=1e-5, atol=1e-6)


def test_hdbscan_large_dense_knots_no_oversegmentation():
    """Regression pin (round-5 fix): offset-shifted tree bases quantize into
    heavy zero-core cells; without the ladder's quantization-scale floor the
    condensed tree resolves below the cell size and every dense cell splits
    off as its own maximally-stable cluster (measured 188 preds / 48 gt on
    the bench plot)."""
    from treelearn_tpu.ops.hdbscan import hdbscan_cluster_large

    n_knots = 24
    rng = np.random.default_rng(5)
    centers = rng.uniform(0, 80, (n_knots, 2)).astype(np.float32)
    knots = (centers[:, None, :]
             + rng.normal(0, 0.15, (n_knots, 1500, 2))).reshape(-1, 2)
    clutter = rng.uniform(0, 80, (8000, 2))
    pts = np.concatenate([knots, clutter]).astype(np.float32)
    labels = hdbscan_cluster_large(pts, 50)
    n_clusters = len(np.unique(labels[labels >= 0]))
    assert n_knots <= n_clusters <= int(1.3 * n_knots), n_clusters
    # each knot lands in one dominant cluster
    knot_ids = np.repeat(np.arange(n_knots), 1500)
    for kn in range(n_knots):
        vals, cnts = np.unique(labels[: n_knots * 1500][knot_ids == kn],
                               return_counts=True)
        assert cnts.max() >= 1200 and vals[cnts.argmax()] >= 0


def test_hdbscan_device_path_coarsening_above_50k(monkeypatch):
    """The eps-ladder device path with hierarchical per-level coarsening
    (ops/hdbscan.py:_level_components) at a size above the old 50k ceiling:
    cluster recovery must match sklearn (ARI), exercising _coarse_reps and
    the explicit nesting union on the CPU engine.  The >=200k on-device run
    is recorded by the bench's tpu_smoke (hdbscan_device_220k)."""
    from sklearn.cluster import HDBSCAN

    monkeypatch.setenv("TL_HDBSCAN_DEVICE_MAX", str(1 << 20))
    n_knots = 30
    rng = np.random.default_rng(6)
    centers = rng.uniform(0, 100, (n_knots, 2)).astype(np.float32)
    knots = (centers[:, None, :]
             + rng.normal(0, 0.2, (n_knots, 1800, 2))).reshape(-1, 2)
    clutter = rng.uniform(0, 100, (6000, 2))
    pts = np.concatenate([knots, clutter]).astype(np.float32)  # 60k
    labels = hdbscan_cluster(pts, min_cluster_size=50,
                             not_assigned_label=-1, start_num=1)
    oracle = HDBSCAN(min_cluster_size=50).fit(pts).labels_
    assert _ari(labels, oracle) > 0.9
    n_ours = len(np.unique(labels[labels >= 1]))
    assert n_knots <= n_ours <= int(1.3 * n_knots), n_ours


def test_union_nested_enforces_hierarchy():
    from treelearn_tpu.ops.hdbscan import _union_nested

    prev = np.array([-1, 0, 0, 5, 5, -1, 7], np.int32)
    cur = np.array([1, 1, 2, 2, 3, 3, -1], np.int32)
    out = _union_nested(prev, cur)
    # prev comp 0 spans cur {1, 2}; prev comp 5 spans cur {2, 3} -> all merge
    assert out[0] == out[1] == out[2] == out[3] == out[4] == out[5]
    assert out[6] == -1
