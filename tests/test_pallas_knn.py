"""Banded k-NN majority kernel (ops/pallas_knn.py) vs brute force.

Interpret mode on CPU; TPU lowering exercised by the pipeline/bench.
Reference semantics: KNeighborsClassifier 5-NN majority
(reference tree_learn/util/pipeline.py:287-331).
"""

import numpy as np
import pytest


def _data(seed=0, n_ref=3000, n_q=500):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 20, (8, 3)) * np.array([1, 1, 0.2])
    refs = np.concatenate([c + rng.normal(0, 0.4, (n_ref // 8, 3))
                           for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(8), n_ref // 8)
    queries = (rng.uniform(0, 20, (n_q, 3))
               * np.array([1, 1, 0.2])).astype(np.float32)
    return refs, labels, queries


def _oracle_vote(refs, labels, queries, k):
    d2 = ((queries[:, None, :].astype(np.float64)
           - refs[None, :, :].astype(np.float64)) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    votes = np.sort(labels[idx], axis=1)
    counts = (votes[:, :, None] == votes[:, None, :]).sum(axis=2)
    return np.take_along_axis(votes, counts.argmax(axis=1)[:, None],
                              axis=1)[:, 0]


def test_banded_knn_matches_bruteforce(monkeypatch):
    import treelearn_tpu.ops.pallas_knn as pk

    monkeypatch.setattr(pk, "_INTERPRET", True)
    refs, labels, queries = _data()
    ours = pk.banded_knn_classify(refs, labels, queries, k=5,
                                 small_refs_kdtree=False)
    ref = _oracle_vote(refs, labels, queries, 5)
    assert (ours == ref).mean() > 0.998  # distance ties may differ


def test_banded_knn_negative_and_zero_labels(monkeypatch):
    """Label encoding must survive -1/0 labels (the pipeline votes over
    {0=non-tree, 1..K} and propagation sources can carry -1)."""
    import treelearn_tpu.ops.pallas_knn as pk

    monkeypatch.setattr(pk, "_INTERPRET", True)
    refs, labels, queries = _data(seed=1)
    labels = labels - 1  # now in {-1, 0, .., 6}
    ours = pk.banded_knn_classify(refs, labels, queries, k=5,
                                 small_refs_kdtree=False)
    ref = _oracle_vote(refs, labels, queries, 5)
    assert (ours == ref).mean() > 0.998


def test_banded_knn_sparse_refs_escalate(monkeypatch):
    """Far-away queries need several cell escalations (or brute force) but
    must still match the oracle exactly."""
    import treelearn_tpu.ops.pallas_knn as pk

    monkeypatch.setattr(pk, "_INTERPRET", True)
    rng = np.random.default_rng(2)
    refs = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 64)
    queries = np.array([[50.0, 50.0, 0.0], [2.0, 2.0, 0.0],
                        [-30.0, 10.0, 1.0]], np.float32)
    ours = pk.banded_knn_classify(refs, labels, queries, k=5,
                                 small_refs_kdtree=False)
    ref = _oracle_vote(refs, labels, queries, 5)
    assert (ours == ref).all()


def test_small_refs_kdtree_route_matches_oracle():
    """Clustered-blob refs (the remaining-point assignment's shape,
    reference util/pipeline.py:287-296) route to the host KD-tree and must
    match the exact majority vote — the banded escalation degenerates on
    this distribution (VERDICT r3: 208 s for 450k x 16k)."""
    import treelearn_tpu.ops.pallas_knn as pk

    rng = np.random.default_rng(3)
    # 40 tight blobs (tree-base clusters) + spread-out queries (crowns)
    centers = rng.uniform(0, 60, (40, 2))
    refs = np.concatenate([
        np.column_stack([c + rng.normal(0, 0.15, (80, 2)),
                         rng.uniform(0, 1, 80)])
        for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(1, 41), 80)
    queries = np.column_stack([
        rng.uniform(0, 60, (2000, 2)),
        rng.uniform(0, 15, 2000)]).astype(np.float32)
    ours = pk.banded_knn_classify(refs, labels, queries, k=5)
    ref = _oracle_vote(refs, labels, queries, 5)
    assert (ours == ref).mean() > 0.998
