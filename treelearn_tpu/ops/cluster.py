"""On-device grouping: eps-graph connected components (DBSCAN mode) and
grid-bucketed k-NN — the TPU replacement for the reference's sklearn
clustering/assignment (reference util/pipeline.py:145-206, 287-331).

Key observation making exact parity cheap: the reference runs
DBSCAN(eps, min_samples=2) and then *discards clusters smaller than tau_min*
(pipeline.py:176-179).  With min_samples=2 every point with a neighbor is core,
so DBSCAN degenerates to connected components of the eps-ball graph; combined
with the tau_min >= 2 size filter, noise handling is subsumed.  So the device
algorithm is: bucket points into cells of eps/sqrt(2) (same-cell points are
always within eps -> exact same-cell unions), add candidate cross-cell edges
from the 5x5 cell neighborhood (capped per cell), and run min-label propagation
with pointer jumping to a fixed point.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import SENTINEL


def _cell_keys(points, valid, cell_size, n_cells_cap: int = 30000):
    """2D cell key per point (int32), SENTINEL for invalid points."""
    ij = jnp.floor(points / cell_size).astype(jnp.int64)
    mins = jnp.min(jnp.where(valid[:, None], ij, jnp.iinfo(jnp.int32).max), axis=0)
    ij = (ij - mins).astype(jnp.int32)
    width = jnp.int32(n_cells_cap)
    key = ij[:, 0] * width + ij[:, 1]
    key = jnp.where(valid & jnp.all(ij < width, axis=1), key, SENTINEL)
    return key, ij


@partial(jax.jit, static_argnames=("eps", "cell_cap", "max_rounds"))
def connected_components_2d(points: jnp.ndarray, valid: jnp.ndarray,
                            eps: float, cell_cap: int = 16,
                            max_rounds: int = 32) -> jnp.ndarray:
    """Labels (N,) int32: connected components of the eps-ball graph over the
    xy ``points``; invalid rows get -1.  Labels are the minimum point index in
    each component (not consecutive — relabel on the host or with sort_unique).
    """
    n = points.shape[0]
    cell = float(eps) / np.sqrt(2.0)
    keys, _ = _cell_keys(points, valid, cell)

    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sorted_pts = points[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    live = sorted_keys != SENTINEL

    # candidate neighbors: for each point, the first `cell_cap` points of each
    # cell in the 5x5 neighborhood (cell = eps/sqrt2 -> radius spans 2 cells).
    width = jnp.int32(30000)
    offsets = [(di, dj) for di in range(-2, 3) for dj in range(-2, 3)
               if di * di + dj * dj <= 8]  # cells possibly within eps
    cand_idx = []
    for di, dj in offsets:
        nbr_key = jnp.where(live, sorted_keys + di * width + dj, SENTINEL)
        start = jnp.searchsorted(sorted_keys, nbr_key).astype(jnp.int32)
        for r in range(cell_cap):
            idx = jnp.clip(start + r, 0, n - 1)
            ok = (sorted_keys[idx] == nbr_key) & live
            cand_idx.append(jnp.where(ok, idx, -1))
    cand = jnp.stack(cand_idx, axis=1)  # (n, n_offsets*cell_cap) sorted-index space

    # exact eps filter on candidates
    cpts = sorted_pts[jnp.clip(cand, 0, n - 1)]
    d2 = jnp.sum(jnp.square(cpts - sorted_pts[:, None, :]), axis=-1)
    good = (cand >= 0) & (d2 <= float(eps) ** 2)
    cand = jnp.where(good, cand, n)  # n = self (no-op in min-propagation)

    # same-cell union: always connect to the first point of the own cell
    # (exact: same-cell distance <= cell*sqrt2 = eps).
    own_rep = jnp.where(live, seg_start, n)
    cand = jnp.concatenate([cand, own_rep[:, None]], axis=1)

    labels0 = jnp.where(live, pos, jnp.int32(n))

    def body(carry):
        labels, _ = carry
        padded = jnp.concatenate([labels, jnp.array([2**30], jnp.int32)])
        nbr_labels = padded[cand]  # (n, C)
        new = jnp.minimum(labels, jnp.min(nbr_labels, axis=1))
        # pointer jumping: label of my label (labels index the sorted space)
        new = jnp.minimum(new, padded[jnp.clip(new, 0, n)])
        new = jnp.minimum(new, padded[jnp.clip(padded[jnp.clip(new, 0, n)], 0, n)])
        changed = jnp.any(new != labels)
        return new, changed

    def cond(carry):
        return carry[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))

    # scatter back to input order; translate sorted-space min index to a stable
    # component id (the original index of the component's min-sorted member).
    comp_orig = jnp.where(labels < n, order[jnp.clip(labels, 0, n - 1)], -1)
    out = jnp.zeros((n,), jnp.int32).at[order].set(comp_orig.astype(jnp.int32))
    return out


def relabel_components_np(labels: np.ndarray, min_size: int,
                          not_assigned_label: int = -1, start_num: int = 1):
    """Host finisher: drop components smaller than min_size, relabel the rest
    consecutively from start_num (parity: group_dbscan + make_labels_consecutive,
    reference util/pipeline.py:173-206)."""
    labels = np.asarray(labels)
    out = np.full(labels.shape, not_assigned_label, np.int64)
    valid = labels >= 0
    uniq, inv, counts = np.unique(labels[valid], return_inverse=True,
                                  return_counts=True)
    keep = counts >= min_size
    new_ids = np.full(len(uniq), not_assigned_label, np.int64)
    new_ids[keep] = np.arange(keep.sum()) + start_num
    out[valid] = new_ids[inv]
    return out


def dbscan_cluster(points_xy: np.ndarray, eps: float, min_size: int,
                   not_assigned_label: int = -1, start_num: int = 1,
                   cell_cap: int = 16) -> np.ndarray:
    """End-to-end DBSCAN-mode grouping: device components + host relabel.

    Accepts/returns numpy; pads to a power-of-two bucket internally.
    """
    n = len(points_xy)
    if n == 0:
        return np.zeros(0, np.int64)
    size = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    pts = np.zeros((size, 2), np.float32)
    pts[:n] = points_xy[:, :2]
    valid = np.zeros(size, bool)
    valid[:n] = True
    comp = np.asarray(connected_components_2d(
        jnp.asarray(pts), jnp.asarray(valid), float(eps), cell_cap=cell_cap))[:n]
    return relabel_components_np(comp, min_size, not_assigned_label, start_num)


# ---------------------------------------------------------------------------
# Grid-bucketed k-NN
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "cell_cap", "ring"))
def _grid_knn_once(ref_pts, ref_valid, query_pts, query_valid, cell_size,
                   k: int, cell_cap: int, ring: int):
    """One fixed-radius k-NN pass: candidates from the (2*ring+1)^2 xy cell
    neighborhood of each query (z enters the distance but not the bucketing —
    forest clouds are xy-extensive and z-thin, so 2D bucketing is the right
    shape).  Returns (idx (Q, k) into ref, d2 (Q, k)); missing -> -1/inf."""
    nr = ref_pts.shape[0]
    keys_r, _ = _cell_keys(ref_pts[:, :2], ref_valid, cell_size)
    order = jnp.argsort(keys_r, stable=True)
    sorted_keys = keys_r[order]
    sorted_ref = ref_pts[order]

    width = jnp.int32(30000)
    mins = jnp.min(jnp.where(ref_valid[:, None],
                             jnp.floor(ref_pts[:, :2] / cell_size).astype(jnp.int64),
                             jnp.iinfo(jnp.int32).max), axis=0)
    qij = (jnp.floor(query_pts[:, :2] / cell_size).astype(jnp.int64) - mins).astype(jnp.int32)

    cand_list = []
    for di in range(-ring, ring + 1):
        for dj in range(-ring, ring + 1):
            nbr_key = (qij[:, 0] + di) * width + (qij[:, 1] + dj)
            key_ok = query_valid & jnp.all((qij + jnp.array([di, dj])) >= 0, axis=1)
            nbr_key = jnp.where(key_ok, nbr_key, SENTINEL)
            start = jnp.searchsorted(sorted_keys, nbr_key).astype(jnp.int32)
            for r in range(cell_cap):
                idx = jnp.clip(start + r, 0, nr - 1)
                # key_ok guard: a SENTINEL nbr_key must not "match" padding rows
                ok = (sorted_keys[idx] == nbr_key) & key_ok
                cand_list.append(jnp.where(ok, idx, -1))
    cand = jnp.stack(cand_list, axis=1)  # (Q, C)

    cpts = sorted_ref[jnp.clip(cand, 0, nr - 1)]
    d2 = jnp.sum(jnp.square(cpts - query_pts[:, None, :]), axis=-1)
    # a ring-1 xy search is only guaranteed complete out to one cell width;
    # farther candidates may not be the true nearest -> mark unfound, escalate
    d2 = jnp.where((cand >= 0) & (d2 <= cell_size * cell_size), d2, jnp.inf)

    neg_d2, top_idx = jax.lax.top_k(-d2, k)
    top_cand = jnp.take_along_axis(cand, top_idx, axis=1)
    found = jnp.isfinite(-neg_d2)
    orig_idx = jnp.where(found, order[jnp.clip(top_cand, 0, nr - 1)], -1)
    return orig_idx, -neg_d2


def grid_knn(ref_pts: np.ndarray, query_pts: np.ndarray, k: int = 5,
             cell_size: float = None, cell_cap: int = 32,
             exact: bool = True) -> np.ndarray:
    """k-NN indices (Q, k) of queries into refs via escalating grid search.

    Host wrapper: pads to buckets, escalates cell size x4 for queries that
    found fewer than k neighbors, without dynamic shapes (each escalation is
    its own compiled program).

    exact=True sizes the per-cell candidate cap to the fullest cell so results
    match brute force (falls back to host brute force past cap 512) — use on
    small/offline paths.  exact=False keeps a fixed cap: on heavily clumped
    data (offset-shifted tree bases) it returns near-nearest neighbors from a
    per-cell sample, which is what the 5-NN majority assignment actually needs
    (reference tolerance: KNeighborsClassifier over millions of points is
    itself distance-tie unstable).
    """
    nq, nr = len(query_pts), len(ref_pts)
    d = ref_pts.shape[1]
    if cell_size is None:
        # heuristic: aim for O(cell_cap) refs per cell under uniform density
        extent = np.ptp(ref_pts[:, :2], axis=0).max() + 1e-6
        cell_size = max(extent / np.sqrt(max(nr, 1) / max(cell_cap, 1)) , 1e-3)

    def pad(a, size, dims):
        out = np.zeros((size, dims), np.float32)
        out[: len(a)] = a
        return out

    size_r = 1 << max(int(np.ceil(np.log2(max(nr, 1024)))), 10)
    size_q = 1 << max(int(np.ceil(np.log2(max(nq, 1024)))), 10)
    ref_j = jnp.asarray(pad(ref_pts, size_r, d))
    rv = np.zeros(size_r, bool); rv[:nr] = True
    qv = np.zeros(size_q, bool); qv[:nq] = True
    query_j = jnp.asarray(pad(query_pts, size_q, d))

    def _pow2(x):
        return 1 << int(np.ceil(np.log2(max(x, 1))))

    def _max_occupancy(cs):
        ij = np.floor(ref_pts[:, :2] / cs).astype(np.int64)
        ij -= ij.min(axis=0)
        lin = ij[:, 0] * (ij[:, 1].max() + 1) + ij[:, 1]
        return int(np.bincount(lin).max())

    idx = np.full((nq, k), -1, np.int64)
    need = np.ones(nq, bool)
    scale = 1.0
    for _ in range(6):
        if not need.any():
            break
        cs = float(cell_size * scale)
        if exact:
            # exactness: the cap must cover the fullest cell at this scale
            cap = _pow2(max(_max_occupancy(cs), k, cell_cap))
            if cap > 512:
                break  # too dense for the grid pass; brute-force stragglers
        else:
            cap = _pow2(max(k, cell_cap))
        out_idx, _ = _grid_knn_once(
            ref_j, jnp.asarray(rv), query_j, jnp.asarray(qv),
            cs, k=k, cell_cap=cap, ring=1)
        out_idx = np.asarray(out_idx)[:nq]
        got_all = (out_idx >= 0).all(axis=1)
        take = need & got_all
        idx[take] = out_idx[take]
        need &= ~got_all
        scale *= 4.0
    if need.any():
        rem = np.where(need)[0]
        if exact or len(rem) * len(ref_pts) <= 2 * 10**8:
            # exact brute force for the stragglers (host)
            d2 = ((query_pts[rem, None, :] - ref_pts[None, :, :]) ** 2).sum(-1)
            idx[rem] = np.argsort(d2, axis=1)[:, :k]
        else:
            # approximate mode on huge data: accept partial neighbor sets from
            # one more coarse pass, filling missing slots with the nearest found
            out_idx, _ = _grid_knn_once(
                ref_j, jnp.asarray(rv), query_j, jnp.asarray(qv),
                float(cell_size * scale), k=k,
                cell_cap=_pow2(max(k, cell_cap)), ring=1)
            partial = np.asarray(out_idx)[:nq][rem]
            have_any = (partial >= 0).any(axis=1)
            nearest = partial[np.arange(len(partial)), (partial >= 0).argmax(axis=1)]
            for col in range(k):
                miss = partial[:, col] < 0
                partial[miss & have_any, col] = nearest[miss & have_any]
            # rows with nothing at all: brute force just those
            none_rows = rem[~have_any]
            if len(none_rows):
                d2 = ((query_pts[none_rows, None, :] - ref_pts[None, :, :]) ** 2).sum(-1)
                partial[~have_any] = np.argsort(d2, axis=1)[:, :k]
            idx[rem] = partial
    return idx


def knn_classify(ref_pts: np.ndarray, ref_labels: np.ndarray,
                 query_pts: np.ndarray, k: int = 5) -> np.ndarray:
    """Majority vote over k nearest refs (reference propagate_preds /
    KNeighborsClassifier, util/pipeline.py:287-331)."""
    idx = grid_knn(ref_pts, query_pts, k=k)
    votes = np.sort(np.asarray(ref_labels)[idx], axis=1)  # (Q, k) ascending
    # vectorized row-mode: count matches within each row; argmax on the sorted
    # row picks the smallest label among ties (bincount-argmax parity).
    counts = (votes[:, :, None] == votes[:, None, :]).sum(axis=2)
    return np.take_along_axis(votes, counts.argmax(axis=1)[:, None], axis=1)[:, 0]
