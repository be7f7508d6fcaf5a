"""On-device grouping vs sklearn oracles."""

import numpy as np
import pytest

from treelearn_tpu.ops.cluster import dbscan_cluster, grid_knn, knn_classify


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
