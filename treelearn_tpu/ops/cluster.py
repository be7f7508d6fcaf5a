"""On-device grouping: eps-graph connected components (DBSCAN mode) and
grid-bucketed k-NN — the TPU replacement for the reference's sklearn
clustering/assignment (reference util/pipeline.py:145-206, 287-331).

Key observation making exact parity cheap: the reference runs
DBSCAN(eps, min_samples=2) and then *discards clusters smaller than tau_min*
(pipeline.py:176-179).  With min_samples=2 every point with a neighbor is core,
so DBSCAN degenerates to connected components of the eps-ball graph; combined
with the tau_min >= 2 size filter, noise handling is subsumed.

Algorithm: bucket points into xy cells of eps/sqrt(2).  All points sharing a
cell are mutually within eps (cell diagonal == eps), so each cell is a clique
and per-point cross-cell edges can target the *cell representative* (first
sorted row of the cell) — connectivity over cells + cliques equals
connectivity over points.  For every point we probe the 5x5 cell neighborhood
with an evenly strided sample of ``cell_cap`` candidates per cell (exhaustive
whenever the cell holds <= cell_cap points, i.e. the result is EXACT whenever
``cell_cap >= max cell occupancy``); discovered edges are symmetrized and the
component minimum is spread by scatter-min label propagation with pointer
jumping.  For denser cells, ``dbscan_cluster`` runs extra phases with rotated
sample offsets, carrying previous component edges, until the labeling is
stable — an approximation that converges monotonically and is validated
against sklearn DBSCAN in tests (adversarial dense-boundary cases included).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import SENTINEL

_GRID_WIDTH = 30000  # linearized cell-key stride (max grid cells per axis)
# python int, NOT jnp.int32: a module-level concrete jnp array becomes a
# hoisted constant buffer in every program that closes over it, which
# interacts badly with jax 0.9 executable caches (see pipeline/inference.py)
_BIG = 2**30


def _cell_keys(points, valid, cell_size, n_cells_cap: int = _GRID_WIDTH):
    """2D cell key per point (int32), SENTINEL for invalid points."""
    ij = jnp.floor(points / cell_size).astype(jnp.int64)
    mins = jnp.min(jnp.where(valid[:, None], ij, jnp.iinfo(jnp.int32).max), axis=0)
    ij = (ij - mins).astype(jnp.int32)
    width = jnp.int32(n_cells_cap)
    key = ij[:, 0] * width + ij[:, 1]
    key = jnp.where(valid & jnp.all(ij < width, axis=1), key, SENTINEL)
    return key, ij


def _pow2(x: int) -> int:
    return 1 << int(np.ceil(np.log2(max(int(x), 1))))


# 5x5 neighborhood: with cell = eps/sqrt2 an eps-ball spans at most 2 cells
# per axis ((+-2,+-2) touches only in the exact d == eps corner case).
_OFFSETS_2D = [(di, dj) for di in range(-2, 3) for dj in range(-2, 3)]


@partial(jax.jit, static_argnames=("cell_cap", "max_rounds"))
def connected_components_2d(points: jnp.ndarray, valid: jnp.ndarray,
                            eps, cell_cap: int = 16,
                            max_rounds: int = 64,
                            phase: jnp.ndarray | float = 0.0,
                            prev_labels: jnp.ndarray | None = None) -> jnp.ndarray:
    """Labels (N,) int32: connected components of the eps-ball graph over the
    xy ``points``; invalid rows get -1.  Labels are the minimum point index in
    each component (not consecutive — relabel on the host or with sort_unique).

    ``phase`` in [0, 1) rotates the strided per-cell candidate sample (used by
    the multi-phase escalation in :func:`dbscan_cluster`).  ``prev_labels``
    (input order, same contract as the return value) adds the previous
    labeling's component edges so phases merge monotonically.

    ``eps`` is traced (not static): one compilation serves every radius — the
    HDBSCAN eps-ladder and the DBSCAN phase escalation reuse the same program.
    """
    n = points.shape[0]
    eps = jnp.float32(eps)
    cell = eps / np.sqrt(2.0).astype(np.float32)
    eps2 = eps * eps
    keys, _ = _cell_keys(points, valid, cell)

    order = jnp.argsort(keys, stable=True)
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    sorted_keys = keys[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             sorted_keys[1:] != sorted_keys[:-1]])
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    live = sorted_keys != SENTINEL

    # per (point, neighbor-cell): run start + length in the sorted order
    width = jnp.int32(_GRID_WIDTH)
    starts, lens = [], []
    for di, dj in _OFFSETS_2D:
        nbr_key = jnp.where(live, sorted_keys + di * width + dj, SENTINEL)
        s = jnp.searchsorted(sorted_keys, nbr_key, side="left").astype(jnp.int32)
        e = jnp.searchsorted(sorted_keys, nbr_key, side="right").astype(jnp.int32)
        ok = live & (nbr_key != SENTINEL)
        starts.append(jnp.where(ok, s, 0))
        lens.append(jnp.where(ok, e - s, 0))
    start_o = jnp.stack(starts, axis=1)  # (n, 25)
    len_o = jnp.stack(lens, axis=1)      # (n, 25)

    # strided candidate scan: rank r probes position floor((r+phase)*L/cap)
    # of each neighbor cell — exhaustive when L <= cap, an evenly spread
    # sample otherwise.  Only the found/not-found bit per cell is kept.
    # Coordinates are gathered per column: an (n, 25, 2) gather would be
    # tiled T(8,128) with the 2-wide minor dim padded to 128 (64x inflation).
    phase_f = jnp.float32(phase)
    len_f = len_o.astype(jnp.float32)
    sorted_x = points[:, 0][order]
    sorted_y = points[:, 1][order]

    def rank_body(found, r):
        offs = jnp.floor((r.astype(jnp.float32) + phase_f)
                         * len_f / jnp.float32(cell_cap)).astype(jnp.int32)
        offs = jnp.minimum(offs, len_o - 1)
        idx = jnp.clip(start_o + offs, 0, n - 1)
        d2 = (jnp.square(sorted_x[idx] - sorted_x[:, None])
              + jnp.square(sorted_y[idx] - sorted_y[:, None]))
        return found | ((len_o > 0) & (d2 <= eps2)), None

    found0 = jnp.zeros((n, len(_OFFSETS_2D)), bool)
    found, _ = jax.lax.scan(rank_body, found0,
                            jnp.arange(cell_cap, dtype=jnp.int32))
    found = found & live[:, None]

    # undirected edge list in sorted space: (probe, neighbor-cell rep) both
    # ways, own-cell clique rep, and previous-phase component edges.
    dst_rep = jnp.where(found, start_o, n)          # n == masked
    src_pt = jnp.broadcast_to(pos[:, None], dst_rep.shape)
    src_pt = jnp.where(found, src_pt, n)
    own_rep = jnp.where(live, seg_start, n)
    live_pos = jnp.where(live, pos, n)
    edge_src = [src_pt.reshape(-1), dst_rep.reshape(-1), live_pos, own_rep]
    edge_dst = [dst_rep.reshape(-1), src_pt.reshape(-1), own_rep, live_pos]
    if prev_labels is not None:
        prev_sorted = jnp.where(
            (prev_labels[order] >= 0) & live,
            inv_order[jnp.clip(prev_labels[order], 0, n - 1)], n)
        edge_src += [live_pos, prev_sorted]
        edge_dst += [prev_sorted, live_pos]
    src = jnp.concatenate(edge_src)
    dst = jnp.concatenate(edge_dst)

    labels0 = jnp.where(live, pos, jnp.int32(n))

    def body(carry):
        labels, _, r = carry
        padded = jnp.concatenate([labels, jnp.array([_BIG], jnp.int32)])
        incoming = jnp.full((n + 1,), _BIG, jnp.int32).at[src].min(padded[dst])
        new = jnp.minimum(labels, incoming[:n])
        padded = jnp.concatenate([new, jnp.array([_BIG], jnp.int32)])
        # pointer jumping: labels index the sorted space
        new = jnp.minimum(new, padded[jnp.clip(new, 0, n)])
        new = jnp.minimum(new, padded[jnp.clip(padded[jnp.clip(new, 0, n)], 0, n)])
        return new, jnp.any(new != labels), r + 1

    def cond(carry):
        return carry[1] & (carry[2] < max_rounds)

    labels, _, _ = jax.lax.while_loop(cond, body,
                                      (labels0, jnp.bool_(True), jnp.int32(0)))

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


def _max_cell_occupancy(points_xy: np.ndarray, cell: float) -> int:
    if len(points_xy) == 0:
        return 0
    ij = np.floor(points_xy / cell).astype(np.int64)
    ij -= ij.min(axis=0)
    lin = ij[:, 0] * (ij[:, 1].max() + 1) + ij[:, 1]
    return int(np.bincount(lin).max())


def dbscan_cluster(points_xy: np.ndarray, eps: float, min_size: int,
                   not_assigned_label: int = -1, start_num: int = 1,
                   cell_cap: int | None = None, max_cap: int = 256,
                   n_phases: int = 4) -> np.ndarray:
    """End-to-end DBSCAN-mode grouping: device components + host relabel.

    Accepts/returns numpy; pads to a power-of-two bucket internally.  The
    per-cell candidate cap escalates to the fullest cell's occupancy (exact
    result) up to ``max_cap``; past that, extra phases with rotated sample
    offsets run until the labeling stabilizes.
    """
    n = len(points_xy)
    if n == 0:
        return np.zeros(0, np.int64)

    if jax.default_backend() == "tpu":
        # banded Pallas found-bits kernel + host union-find: exact at any
        # density, milliseconds on device.  The XLA formulation below is kept
        # for CPU runs (small tests) — at (262144, 256) it crashed the TPU
        # runtime outright (ops/pallas_cc.py docstring).
        from .pallas_cc import cc_labels_banded

        comp = cc_labels_banded(points_xy[:, :2].astype(np.float32),
                                float(eps))
        return relabel_components_np(comp, min_size, not_assigned_label,
                                     start_num)

    size = _pow2(max(n, 1024))
    pts = np.zeros((size, 2), np.float32)
    pts[:n] = points_xy[:, :2]
    valid = np.zeros(size, bool)
    valid[:n] = True

    max_occ = _max_cell_occupancy(points_xy[:, :2], float(eps) / np.sqrt(2.0))
    if cell_cap is None:
        cell_cap = min(_pow2(max(max_occ, 16)), _pow2(max_cap))
    exact = max_occ <= cell_cap

    pts_j, valid_j = jnp.asarray(pts), jnp.asarray(valid)
    comp = connected_components_2d(pts_j, valid_j, float(eps),
                                   cell_cap=cell_cap, phase=0.0)
    if not exact:
        prev = np.asarray(comp)
        for p in range(1, n_phases):
            comp = connected_components_2d(
                pts_j, valid_j, float(eps), cell_cap=cell_cap,
                phase=p / n_phases, prev_labels=jnp.asarray(prev))
            cur = np.asarray(comp)
            if (cur == prev).all():
                break
            prev = cur
        comp = prev
    return relabel_components_np(np.asarray(comp)[:n], min_size,
                                 not_assigned_label, start_num)


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
    # columnar: ref_pts[order] would materialize (R, d) with the tiny d minor
    # dim padded to 128 by the TPU tiling
    sorted_cols = [ref_pts[:, c][order] for c in range(ref_pts.shape[1])]

    width = jnp.int32(_GRID_WIDTH)
    mins = jnp.min(jnp.where(ref_valid[:, None],
                             jnp.floor(ref_pts[:, :2] / cell_size).astype(jnp.int64),
                             jnp.iinfo(jnp.int32).max), axis=0)
    qij = (jnp.floor(query_pts[:, :2] / cell_size).astype(jnp.int64) - mins).astype(jnp.int32)

    r_arr = jnp.arange(cell_cap, dtype=jnp.int32)
    cand_list = []
    for di in range(-ring, ring + 1):
        for dj in range(-ring, ring + 1):
            nbr_key = (qij[:, 0] + di) * width + (qij[:, 1] + dj)
            key_ok = query_valid & jnp.all((qij + jnp.array([di, dj])) >= 0, axis=1)
            nbr_key = jnp.where(key_ok, nbr_key, SENTINEL)
            start = jnp.searchsorted(sorted_keys, nbr_key,
                                     side="left").astype(jnp.int32)
            end = jnp.searchsorted(sorted_keys, nbr_key,
                                   side="right").astype(jnp.int32)
            length = end - start
            # strided sample over the whole cell when it overflows the cap
            # (an evenly spread subset, never just the first rows — cells can
            # hold several distinct structures); exhaustive when the cell
            # fits.  Broadcast over ranks: one (Q, cap) gather per neighbor
            # cell, not cap separate ops (keeps the HLO graph small).
            offs = jnp.where(length[:, None] > cell_cap,
                             (r_arr[None, :] * length[:, None]) // cell_cap,
                             r_arr[None, :])
            idx = jnp.clip(start[:, None] + offs, 0, nr - 1)
            # key_ok guard: a SENTINEL nbr_key must not "match" padding rows
            ok = (sorted_keys[idx] == nbr_key[:, None]) & key_ok[:, None]
            cand_list.append(jnp.where(ok, idx, -1))
    cand = jnp.concatenate(cand_list, axis=1)  # (Q, C)

    # per-coordinate gathers: a (Q, C, d) gather would be tiled T(8,128) with
    # the d=2/3 minor dim padded to 128 (40-60x physical inflation); gathering
    # each column keeps every buffer (Q, C) with a large minor dim
    safe = jnp.clip(cand, 0, nr - 1)
    d2 = jnp.zeros(cand.shape, jnp.float32)
    for c, col in enumerate(sorted_cols):
        d2 = d2 + jnp.square(col[safe] - query_pts[:, c][:, None])
    # a ring-1 xy search is only guaranteed complete out to one cell width;
    # farther candidates may not be the true nearest -> mark unfound, escalate
    d2 = jnp.where((cand >= 0) & (d2 <= cell_size * cell_size), d2, jnp.inf)

    neg_d2, top_idx = jax.lax.top_k(-d2, k)
    top_cand = jnp.take_along_axis(cand, top_idx, axis=1)
    found = jnp.isfinite(-neg_d2)
    orig_idx = jnp.where(found, order[jnp.clip(top_cand, 0, nr - 1)], -1)
    return orig_idx, -neg_d2


@partial(jax.jit, static_argnames=("k", "r_block", "exact"))
def _brute_topk_block(ref_pts, ref_valid, query_blk, k: int, r_block: int,
                      exact: bool = True):
    """Streaming k-NN of one query block against all refs.

    Scans the refs in ``r_block`` chunks keeping a running top-k, so device
    memory is O(Q * r_block) regardless of the ref count.  The cross term is
    a (Q, d) @ (d, r_block) matmul (MXU) — never a dense (Q, R) materialize.

    ``exact=True`` uses lax.top_k per chunk (true nearest neighbors,
    guaranteed); ``exact=False`` uses the TPU-optimized approx_max_k
    reduction (recall ~0.99) which is faster on wide chunks but may drop a
    true neighbor.
    """
    nr = ref_pts.shape[0]
    n_chunks = nr // r_block
    nq = query_blk.shape[0]
    q2 = jnp.sum(jnp.square(query_blk), axis=-1)

    def scan_fn(carry, inputs):
        best_d2, best_idx = carry
        rpts, rval, base = inputs
        r2 = jnp.sum(jnp.square(rpts), axis=-1)
        d2 = q2[:, None] + r2[None, :] - 2.0 * (query_blk @ rpts.T)
        d2 = jnp.where(rval[None, :], d2, jnp.inf)
        # two-stage top-k: a per-chunk reduction shrinks the chunk to ~2k
        # candidates, the exact top_k over the concatenated candidates
        # finishes.  The reduction is exact (lax.top_k) by default; callers
        # that tolerate ~0.99 recall pass exact=False for the approx_max_k
        # variant (full-lane-width exact top_k once measured ~0.1% MFU on a
        # 3Mx1.8M assignment; the two-stage form recovers most of that).
        kk = min(2 * k, d2.shape[1])
        if exact:
            neg_c, sel_c = jax.lax.top_k(-d2, kk)
        else:
            neg_c, sel_c = jax.lax.approx_max_k(-d2, kk, recall_target=0.99)
        idx_c = (base + sel_c).astype(jnp.int32)
        cat_d2 = jnp.concatenate([best_d2, -neg_c], axis=1)
        cat_idx = jnp.concatenate([best_idx, idx_c], axis=1)
        neg, sel = jax.lax.top_k(-cat_d2, k)
        return (-neg, jnp.take_along_axis(cat_idx, sel, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    chunks = (ref_pts.reshape(n_chunks, r_block, -1),
              ref_valid.reshape(n_chunks, r_block),
              (jnp.arange(n_chunks, dtype=jnp.int32) * r_block))
    (d2, idx), _ = jax.lax.scan(scan_fn, init, chunks)
    return idx, d2


def brute_knn(ref_pts: np.ndarray, query_pts: np.ndarray, k: int = 5,
              q_block: int = 8192, r_block: int = 32768,
              return_d2: bool = False, exact: bool = True) -> np.ndarray:
    """Exact k-NN with bounded memory: blocks queries on the host, streams
    refs on the device.  Peak device memory ~= q_block * r_block floats.
    With ``return_d2`` also returns the (Q, k) squared distances.

    Exact by default — callers (banded_knn_classify's backstop, HDBSCAN core
    distances) depend on true nearest neighbors.  ``exact=False`` opts into
    the faster ~0.99-recall approximate chunk reduction."""
    nq, nr = len(query_pts), len(ref_pts)
    k_eff = min(k, nr)
    r_block = min(r_block, _pow2(max(nr, 16)))
    size_r = int(np.ceil(max(nr, 1) / r_block)) * r_block
    ref = np.zeros((size_r, ref_pts.shape[1]), np.float32)
    ref[:nr] = ref_pts
    rv = np.zeros(size_r, bool)
    rv[:nr] = True
    ref_j, rv_j = jnp.asarray(ref), jnp.asarray(rv)

    out = np.empty((nq, k), np.int64)
    out_d2 = np.empty((nq, k), np.float32) if return_d2 else None
    q_block = min(q_block, _pow2(max(nq, 16)))
    for lo in range(0, nq, q_block):
        hi = min(lo + q_block, nq)
        blk = np.zeros((q_block, query_pts.shape[1]), np.float32)
        blk[: hi - lo] = query_pts[lo:hi]
        idx, d2 = _brute_topk_block(ref_j, rv_j, jnp.asarray(blk),
                                    k=k_eff, r_block=r_block, exact=exact)
        idx = np.asarray(idx)[: hi - lo]
        d2 = np.asarray(d2)[: hi - lo]
        if k_eff < k:  # fewer refs than k: repeat the nearest
            idx = np.concatenate(
                [idx, np.repeat(idx[:, :1], k - k_eff, axis=1)], axis=1)
            d2 = np.concatenate(
                [d2, np.repeat(d2[:, :1], k - k_eff, axis=1)], axis=1)
        out[lo:hi] = idx
        if return_d2:
            out_d2[lo:hi] = d2
    return (out, out_d2) if return_d2 else out


def _grid_knn_blocked(ref_j, rv_j, query_pts: np.ndarray, need: np.ndarray,
                      cell_size: float, k: int, cell_cap: int,
                      q_block: int = 1 << 15) -> np.ndarray:
    """Run _grid_knn_once over the ``need``-marked queries in host blocks so
    device memory stays O(q_block * 9 * cell_cap) at any query count."""
    rem = np.where(need)[0]
    d = query_pts.shape[1]
    out = np.full((len(rem), k), -1, np.int64)
    qb = min(q_block, _pow2(max(len(rem), 256)))
    for lo in range(0, len(rem), qb):
        hi = min(lo + qb, len(rem))
        blk = np.zeros((qb, d), np.float32)
        blk[: hi - lo] = query_pts[rem[lo:hi]]
        qv = np.zeros(qb, bool)
        qv[: hi - lo] = True
        got, _ = _grid_knn_once(ref_j, rv_j, jnp.asarray(blk), jnp.asarray(qv),
                                float(cell_size), k=k, cell_cap=cell_cap,
                                ring=1)
        out[lo:hi] = np.asarray(got)[: hi - lo]
    return out


def grid_knn(ref_pts: np.ndarray, query_pts: np.ndarray, k: int = 5,
             cell_size: float = None, cell_cap: int = 32,
             exact: bool = True) -> np.ndarray:
    """k-NN indices (Q, k) of queries into refs via escalating grid search.

    Host wrapper: blocks the query side (bounded device memory at any scale),
    escalates cell size x4 for queries that found fewer than k neighbors,
    without dynamic shapes (each escalation is its own compiled program).

    exact=True sizes the per-cell candidate cap to the fullest cell so results
    match brute force; cells denser than 512 points (heavily clumped data,
    e.g. offset-shifted tree bases) skip the grid and go to the streaming
    chunked brute-force pass — bounded memory at any scale.  exact=False keeps
    a fixed cap: it returns near-nearest neighbors from an evenly strided
    per-cell sample, which is what the 5-NN majority assignment actually needs
    (reference tolerance: KNeighborsClassifier over millions of points is
    itself distance-tie unstable).
    """
    nq, nr = len(query_pts), len(ref_pts)
    d = ref_pts.shape[1]
    if cell_size is None:
        # heuristic: aim for O(cell_cap) refs per cell under uniform density
        extent = np.ptp(ref_pts[:, :2], axis=0).max() + 1e-6
        cell_size = max(extent / np.sqrt(max(nr, 1) / max(cell_cap, 1)), 1e-3)

    size_r = _pow2(max(nr, 1024))
    ref = np.zeros((size_r, d), np.float32)
    ref[:nr] = ref_pts
    rv = np.zeros(size_r, bool); rv[:nr] = True
    ref_j, rv_j = jnp.asarray(ref), jnp.asarray(rv)

    idx = np.full((nq, k), -1, np.int64)
    need = np.ones(nq, bool)
    scale = 1.0
    for _ in range(6):
        if not need.any():
            break
        cs = float(cell_size * scale)
        if exact:
            # exactness: the cap must cover the fullest cell at this scale
            cap = _pow2(max(_max_cell_occupancy(ref_pts[:, :2], cs), k, cell_cap))
            if cap > 512:
                break  # too dense for the grid pass; chunked brute force below
        else:
            cap = _pow2(max(k, cell_cap))
        out_idx = _grid_knn_blocked(ref_j, rv_j, query_pts, need, cs,
                                    k=k, cell_cap=cap)
        rem = np.where(need)[0]
        got_all = (out_idx >= 0).all(axis=1)
        idx[rem[got_all]] = out_idx[got_all]
        need[rem[got_all]] = False
        scale *= 4.0
    if need.any():
        rem = np.where(need)[0]
        if exact or len(rem) * nr <= 2 * 10**10:
            # exact streaming brute force for the stragglers (bounded memory)
            idx[rem] = brute_knn(ref_pts, query_pts[rem], k=k)
        else:
            # approximate mode on huge data: accept partial neighbor sets from
            # one more coarse pass, filling missing slots with the nearest found
            partial_idx = _grid_knn_blocked(
                ref_j, rv_j, query_pts, need, float(cell_size * scale),
                k=k, cell_cap=_pow2(max(k, cell_cap)))
            have_any = (partial_idx >= 0).any(axis=1)
            nearest = partial_idx[np.arange(len(partial_idx)),
                                  (partial_idx >= 0).argmax(axis=1)]
            for col in range(k):
                miss = partial_idx[:, col] < 0
                partial_idx[miss & have_any, col] = nearest[miss & have_any]
            # rows with nothing at all: streaming brute force just those
            none_rows = rem[~have_any]
            if len(none_rows):
                partial_idx[~have_any] = brute_knn(ref_pts,
                                                   query_pts[none_rows], k=k)
            idx[rem] = partial_idx
    return idx


def knn_classify(ref_pts: np.ndarray, ref_labels: np.ndarray,
                 query_pts: np.ndarray, k: int = 5) -> np.ndarray:
    """Majority vote over k nearest refs (reference propagate_preds /
    KNeighborsClassifier, util/pipeline.py:287-331)."""
    if jax.default_backend() == "tpu":
        from .pallas_knn import banded_knn_classify

        return banded_knn_classify(ref_pts, ref_labels, query_pts, k=k)
    idx = grid_knn(ref_pts, query_pts, k=k)
    votes = np.sort(np.asarray(ref_labels)[idx], axis=1)  # (Q, k) ascending
    # vectorized row-mode: count matches within each row; argmax on the sorted
    # row picks the smallest label among ties (bincount-argmax parity).
    counts = (votes[:, :, None] == votes[:, None, :]).sum(axis=2)
    return np.take_along_axis(votes, counts.argmax(axis=1)[:, None], axis=1)[:, 0]
