"""Banded found-bits CC kernel (ops/pallas_cc.py) vs sklearn DBSCAN.

Interpret mode on CPU; the TPU lowering is exercised by the pipeline/bench.
Reference semantics: DBSCAN(eps, min_samples=2) + tau_min filter
(reference tree_learn/util/pipeline.py:156-180).
"""

import numpy as np
import pytest


def _blobs(seed=0, n_blobs=6, pts=150, spread=0.04, sep=4.0, noise=40):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, sep * n_blobs, (n_blobs, 2))
    pts_list = [c + rng.normal(0, spread, (pts, 2)) for c in centers]
    scatter = rng.uniform(0, sep * n_blobs, (noise, 2))
    return np.vstack(pts_list + [scatter]).astype(np.float32)


def _sklearn_components(xy, eps):
    sklearn = pytest.importorskip("sklearn.cluster")
    # min_samples=1: pure eps-graph connected components (every point core)
    return sklearn.DBSCAN(eps=eps, min_samples=1).fit(xy).labels_


def _assert_same_partition(ours, ref):
    pairs = set(zip(ours.tolist(), ref.tolist()))
    assert len(pairs) == len(set(ours.tolist())) == len(set(ref.tolist()))


def test_cc_banded_matches_sklearn_components(monkeypatch):
    import treelearn_tpu.ops.pallas_cc as pcc

    monkeypatch.setattr(pcc, "_INTERPRET", True)
    xy = _blobs()
    labels = pcc.cc_labels_banded(xy, eps=0.15)
    _assert_same_partition(labels, _sklearn_components(xy, 0.15))


def test_cc_banded_dense_boundary(monkeypatch):
    """Two dense adjacent clusters joined by a single bridge pair — the case
    a capped candidate sample can miss (VERDICT round-1 weak #3)."""
    import treelearn_tpu.ops.pallas_cc as pcc

    monkeypatch.setattr(pcc, "_INTERPRET", True)
    rng = np.random.default_rng(7)
    a = rng.normal([0.0, 0.0], 0.03, (800, 2))
    b = rng.normal([0.5, 0.0], 0.03, (800, 2))
    bridge = np.array([[0.2, 0.0], [0.3, 0.0]])
    xy = np.vstack([a, bridge, b]).astype(np.float32)
    labels = pcc.cc_labels_banded(xy, eps=0.15)
    _assert_same_partition(labels, _sklearn_components(xy, 0.15))
    assert len(np.unique(labels)) == 1  # everything connects through the bridge


def test_cc_banded_overflow_fallback(monkeypatch):
    """A tiny window forces every tile to overflow; the numpy fallback must
    deliver identical components."""
    import treelearn_tpu.ops.pallas_cc as pcc

    monkeypatch.setattr(pcc, "_INTERPRET", True)
    xy = _blobs(seed=3, n_blobs=4, pts=100)
    labels = pcc.cc_labels_banded(xy, eps=0.15, tile=64, window=128)
    _assert_same_partition(labels, _sklearn_components(xy, 0.15))
