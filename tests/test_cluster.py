"""On-device grouping vs sklearn oracles."""

import numpy as np
import pytest

from treelearn_tpu.ops.cluster import (brute_knn, dbscan_cluster, grid_knn,
                                       knn_classify)


def _same_partition(ours, ref, tau_min):
    """Assert ours (tau_min already applied) equals the reference labeling
    after the reference's tau_min filter, up to label bijection."""
    uniq, counts = np.unique(ref[ref != -1], return_counts=True)
    keep = set(uniq[counts >= tau_min].tolist())
    ref_f = np.where(np.isin(ref, list(keep)), ref, -1)
    assert ((ours != -1) == (ref_f != -1)).all()
    mask = ours != -1
    pairs = set(zip(ours[mask].tolist(), ref_f[mask].tolist()))
    assert len(pairs) == len(set(p[0] for p in pairs)) \
        == len(set(p[1] for p in pairs))


def _blobs(seed=0, n_blobs=6, pts=120, spread=0.04, sep=4.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, sep * n_blobs, (n_blobs, 2))
    pts_list = [c + rng.normal(0, spread, (pts, 2)) for c in centers]
    noise = rng.uniform(0, sep * n_blobs, (30, 2))
    xy = np.vstack(pts_list + [noise]).astype(np.float32)
    return xy


def test_dbscan_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.cluster")
    xy = _blobs()
    eps, tau_min = 0.15, 50

    ours = dbscan_cluster(xy, eps=eps, min_size=tau_min,
                          not_assigned_label=-1, start_num=1)

    ref = sklearn.DBSCAN(eps=eps, min_samples=2).fit(xy).labels_
    # apply the reference's tau_min filter (util/pipeline.py:173-180)
    uniq, counts = np.unique(ref[ref != -1], return_counts=True)
    keep = set(uniq[counts >= tau_min])
    ref_filtered = np.where(np.isin(ref, list(keep)), ref, -1)

    # same partition: assigned sets equal and label-bijective
    assert ((ours != -1) == (ref_filtered != -1)).all()
    mask = ours != -1
    pairs = set(zip(ours[mask].tolist(), ref_filtered[mask].tolist()))
    assert len(pairs) == len(set(p[0] for p in pairs)) == len(set(p[1] for p in pairs))


def test_dbscan_chain_connectivity():
    """A chain of points spaced just under eps must form one component."""
    eps = 0.15
    xy = np.stack([np.arange(100) * (eps * 0.9), np.zeros(100)], axis=1).astype(np.float32)
    labels = dbscan_cluster(xy, eps=eps, min_size=50)
    assert (labels == 1).all()


def test_dbscan_separated_clusters_not_merged():
    eps = 0.15
    a = np.random.default_rng(0).normal(0, 0.02, (100, 2))
    b = a + np.array([1.0, 0])  # 1 m apart >> eps
    labels = dbscan_cluster(np.vstack([a, b]).astype(np.float32), eps=eps, min_size=50)
    assert set(labels[:100]) == {1} and set(labels[100:]) == {2}


def test_dbscan_adversarial_dense_boundary():
    """Two dense cells whose first-inserted points are mutually far apart but
    whose later points bridge the eps gap: the old first-k candidate sampling
    missed this merge; strided occupancy-aware sampling must find it."""
    sklearn = pytest.importorskip("sklearn.cluster")
    eps = 0.15
    cell = eps / np.sqrt(2.0)
    rng = np.random.default_rng(3)
    # cell A = [0,cell)^2, cell B = [cell,2cell) x [0,cell): bridge points sit
    # at the shared boundary but are inserted LAST in each cell's order.
    a_far = np.column_stack([rng.uniform(0.0, 0.2 * cell, 60),
                             rng.uniform(0, cell * 0.98, 60)])
    b_far = np.column_stack([rng.uniform(1.8 * cell, 1.98 * cell, 60),
                             rng.uniform(0, cell * 0.98, 60)])
    a_bridge = np.column_stack([np.full(60, cell * 0.99),
                                rng.uniform(0, cell * 0.98, 60)])
    b_bridge = np.column_stack([np.full(60, cell * 1.01),
                                rng.uniform(0, cell * 0.98, 60)])
    xy = np.vstack([a_far, b_far, a_bridge, b_bridge]).astype(np.float32)

    ours = dbscan_cluster(xy, eps=eps, min_size=2)
    ref = sklearn.DBSCAN(eps=eps, min_samples=2).fit(xy).labels_
    _same_partition(ours, ref, tau_min=2)
    assert len(np.unique(ours[ours != -1])) == 1  # everything merged


def test_dbscan_dense_clumps_vs_sklearn():
    """Heavily clumped data (offset-shifted tree bases): occupancy far above
    the candidate cap forces the multi-phase escalation path."""
    sklearn = pytest.importorskip("sklearn.cluster")
    eps, tau_min = 0.15, 50
    rng = np.random.default_rng(4)
    clumps = [rng.normal(c, 0.05, (800, 2))
              for c in rng.uniform(0, 20, (8, 2))]
    noise = rng.uniform(0, 20, (200, 2))
    xy = np.vstack(clumps + [noise]).astype(np.float32)

    ours = dbscan_cluster(xy, eps=eps, min_size=tau_min, max_cap=32)
    ref = sklearn.DBSCAN(eps=eps, min_samples=2).fit(xy).labels_
    _same_partition(ours, ref, tau_min=tau_min)


def test_brute_knn_matches_brute_force():
    rng = np.random.default_rng(5)
    ref = rng.uniform(0, 10, (777, 3)).astype(np.float32)  # non-pow2 count
    query = rng.uniform(0, 10, (130, 3)).astype(np.float32)
    idx = brute_knn(ref, query, k=5, q_block=64, r_block=128)
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    got = np.sort(np.take_along_axis(d2, idx, axis=1), axis=1)
    want = np.sort(np.sort(d2, axis=1)[:, :5], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_brute_knn_fewer_refs_than_k():
    ref = np.array([[0.0, 0, 0], [1, 0, 0]], np.float32)
    query = np.array([[0.1, 0, 0]], np.float32)
    idx = brute_knn(ref, query, k=5)
    assert idx.shape == (1, 5)
    assert idx[0, 0] == 0  # nearest first, then repeats


def test_grid_knn_clumped_bounded_memory():
    """Offset-shifted clumped refs (the remaining-point-assignment shape that
    blew up round 1's dense fallback): must complete in bounded memory and
    match labels from sklearn."""
    sklearn = pytest.importorskip("sklearn.neighbors")
    rng = np.random.default_rng(6)
    # 1e5 refs collapsed onto 20 tree bases (dense cells >> any cap)
    bases = rng.uniform(0, 50, (20, 3)).astype(np.float32)
    ref = np.repeat(bases, 5000, axis=0) + rng.normal(0, 0.03, (100000, 3)).astype(np.float32)
    labels = np.repeat(np.arange(1, 21), 5000)
    query = (bases[rng.integers(0, 20, 2000)]
             + rng.normal(0, 0.5, (2000, 3))).astype(np.float32)

    ours = knn_classify(ref, labels, query, k=5)
    knn = sklearn.KNeighborsClassifier(n_neighbors=5).fit(ref, labels)
    want = knn.predict(query)
    # clump geometry: essentially every query is nearest its own base
    assert (ours == want).mean() > 0.99


def test_grid_knn_matches_brute_force():
    rng = np.random.default_rng(1)
    ref = rng.uniform(0, 10, (800, 3)).astype(np.float32)
    query = rng.uniform(0, 10, (200, 3)).astype(np.float32)
    idx = grid_knn(ref, query, k=5)
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    brute = np.argsort(d2, axis=1)[:, :5]
    # compare distances (indices may tie)
    got = np.sort(np.take_along_axis(d2, idx, axis=1), axis=1)
    want = np.sort(np.take_along_axis(d2, brute, axis=1), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_knn_classify_majority():
    sklearn = pytest.importorskip("sklearn.neighbors")
    rng = np.random.default_rng(2)
    ref = np.vstack([rng.normal(0, 0.3, (100, 3)), rng.normal(5, 0.3, (100, 3))]).astype(np.float32)
    labels = np.repeat([1, 2], 100)
    query = np.vstack([rng.normal(0, 0.3, (40, 3)), rng.normal(5, 0.3, (40, 3))]).astype(np.float32)

    ours = knn_classify(ref, labels, query, k=5)
    knn = sklearn.KNeighborsClassifier(n_neighbors=5).fit(ref, labels)
    np.testing.assert_array_equal(ours, knn.predict(query))
