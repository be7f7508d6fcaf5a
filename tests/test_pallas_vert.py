"""Banded moment-GEMM verticality kernel (ops/pallas_vert.py) vs brute force.

Runs the Pallas kernel in interpret mode on CPU (fast, numerics-identical
logic); the TPU lowering is exercised by the bench/pipeline on hardware.
Reference semantics: jakteristics verticality with radius search
(reference tree_learn/util/data_preparation.py:83-100).
"""

import numpy as np
import pytest


def _forest(seed=0, n_ground=2500, n_trunks=5):
    rng = np.random.default_rng(seed)
    ground = np.column_stack([
        rng.uniform(0, 10, n_ground), rng.uniform(0, 10, n_ground),
        rng.normal(scale=0.03, size=n_ground)]).astype(np.float32)
    parts = [ground]
    for _ in range(n_trunks):
        c = rng.uniform(1, 9, 2)
        m = 250
        parts.append(np.column_stack([
            c[0] + rng.normal(scale=0.04, size=m),
            c[1] + rng.normal(scale=0.04, size=m),
            rng.uniform(0, 4, m)]).astype(np.float32))
    return np.vstack(parts)


def _oracle(pts, queries, r):
    vert = np.full(len(queries), np.nan)
    cnt = np.zeros(len(queries))
    pts64 = pts.astype(np.float64)
    for i, q in enumerate(queries.astype(np.float64)):
        d2 = ((pts64 - q) ** 2).sum(1)
        nb = pts64[d2 <= r * r]
        cnt[i] = len(nb)
        if len(nb) >= 3:
            w, v = np.linalg.eigh(np.cov(nb.T, bias=True))
            vert[i] = 1.0 - abs(v[:, 0][2])
    return vert, cnt


def test_banded_verticality_interpret_matches_bruteforce(monkeypatch):
    import treelearn_tpu.ops.pallas_vert as pv

    monkeypatch.setattr(pv, "_INTERPRET", True)
    pts = _forest()
    rng = np.random.default_rng(1)
    qidx = np.sort(rng.choice(len(pts), int(0.7 * len(pts)), replace=False))
    queries = pts[qidx]
    r = 0.6

    vert, cnt, over = pv.verticality_banded(pts, queries, r)
    ov, oc = _oracle(pts, queries, r)

    ok = ~over & (oc >= 3)
    assert ok.mean() > 0.9  # dense query sets rarely overflow windows
    # neighbor sets are exact -> counts match the brute force exactly
    np.testing.assert_array_equal(cnt[ok], oc[ok])
    err = np.abs(vert[ok] - ov[ok])
    assert np.nanmax(err) < 0.01
    assert np.nanmean(err) < 1e-3


def test_banded_verticality_overflow_routed_to_fallback(monkeypatch):
    """Scattered queries overflow a small window; compute_verticality must
    route them to the XLA pass and still return correct values."""
    import functools

    import treelearn_tpu.ops.pallas_vert as pv
    from treelearn_tpu.ops.features import compute_verticality

    monkeypatch.setattr(pv, "_INTERPRET", True)
    # shrink the band window so scattered query tiles overflow it
    small = functools.partial(pv.verticality_banded, tile=64, window=128)
    monkeypatch.setattr(pv, "verticality_banded", small)
    pts = _forest(seed=2)
    rng = np.random.default_rng(3)
    qidx = np.sort(rng.choice(len(pts), 64, replace=False))

    _, _, over = pv.verticality_banded(pts, pts[qidx], 0.6)
    assert over.any()  # sparse tiles span too many cells

    vert = compute_verticality(pts, search_radius=0.6, query_idx=qidx,
                               use_banded=True)
    ov, oc = _oracle(pts, pts[qidx], 0.6)
    has = oc >= 3
    # fallback pass caps candidates per cell -> compare with loose tolerance
    assert np.nanmean(np.abs(vert[has, 0] - ov[has])) < 0.05


def test_compute_verticality_banded_agrees_with_xla_pass(monkeypatch):
    import treelearn_tpu.ops.pallas_vert as pv
    from treelearn_tpu.ops.features import compute_verticality

    monkeypatch.setattr(pv, "_INTERPRET", True)
    pts = _forest(seed=4)
    qidx = np.arange(0, len(pts), 2)
    v_banded = compute_verticality(pts, search_radius=0.6, query_idx=qidx,
                                   use_banded=True)
    v_xla = compute_verticality(pts, search_radius=0.6, query_idx=qidx,
                                use_banded=False, cell_cap=512)
    thresh_agree = np.mean((v_banded[:, 0] > 0.6) == (v_xla[:, 0] > 0.6))
    assert thresh_agree > 0.995
