"""Pallas TPU kernel for eps-graph connectivity: banded neighbor-cell bits.

DBSCAN(eps, min_samples=2) + tau_min filtering degenerates to connected
components of the eps-ball graph (see ops/cluster.py).  With cells of
eps/sqrt(2) every cell is a clique, so the graph's component structure is
fully captured by, per point, the 25 bits "does cell (di, dj), di,dj in
[-2, 2], contain an in-eps neighbor?" — edges go from each point to the
*representative* (first sorted row) of each found cell, and a host-side
union-find (scipy.sparse.csgraph) finishes in O(n alpha).

The kernel is the same banded structure as ops/pallas_vert.py: both sides
sorted by cell key, five contiguous ref windows per query tile (one per cell
row di), dense (T, W) distance masks on the VPU, per-(di, dj) masked ANY
reductions into 25 output lanes.  No gathers, no scatter loops, no
while_loop — the XLA formulation of the same computation (25 searchsorteds +
a cap-rank gather scan + scatter-min label propagation) compiled to a
program that crashed the TPU runtime outright at the (262144, 256) shape
and ran 30s+ elsewhere; this kernel runs in milliseconds.

Exact: every neighbor within the window is tested (the cell-match mask
de-duplicates overlapping bands); tiles whose neighborhood overflows the
window are flagged and the caller routes them to a chunked numpy fallback,
so results never silently drop edges.

Reference semantics: DBSCAN(eps=grouping.tau_group, min_samples=2) over
offset-shifted xy (reference tree_learn/util/pipeline.py:156-180).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 64
DEFAULT_WINDOW = 2048
_ALIGN = 128         # lane-dim DMA slices must start 128-aligned
_GRID_WIDTH = 30000  # cell-key stride, matches ops/cluster.py

_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"

# ref matrix rows (feature-major, (8, V)): [valid, x, y, cell_i, cell_j]
# query matrix columns ((Q, 128)): [x, y, cell_i, cell_j, valid]


def _cc_kernel(lo_ref, n_live_ref, q_ref, refs_hbm, out_ref, window_buf,
               acc_ref, sems, *, window, tile, eps):
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * tile < n_live_ref[0])
    def _():
        def dma(band, slot):
            start = pl.multiple_of(lo_ref[band, t], _ALIGN)
            return pltpu.make_async_copy(
                refs_hbm.at[:, pl.ds(start, window)],
                window_buf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        qx = q_ref[:, 0:1]               # (T, 1)
        qy = q_ref[:, 1:2]
        qi = q_ref[:, 2:3]
        qj = q_ref[:, 3:4]
        qvalid = q_ref[:, 4:5] > 0.0

        eps2 = jnp.float32(eps * eps)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        for band in range(5):            # di = band - 2
            slot = band % 2
            if band + 1 < 5:
                dma(band + 1, (band + 1) % 2).start()
            dma(band, slot).wait()

            win = window_buf[slot]       # (8, W) feature-major
            wvalid = win[0:1, :]
            wx = win[1:2, :]
            wy = win[2:3, :]
            wi = win[3:4, :]
            wj = win[4:5, :]

            dx = wx - qx                 # (T, W)
            dy = wy - qy
            d2 = dx * dx + dy * dy

            di = jnp.float32(band - 2)
            base = ((d2 <= eps2)
                    & (wi == qi + di)
                    & (wvalid > 0.0)
                    & qvalid)

            djs = wj - qj                # (T, W)
            for dj_idx in range(5):
                dj = jnp.float32(dj_idx - 2)
                m = base & (djs == dj)
                bit = jnp.max(m.astype(jnp.float32), axis=1,
                              keepdims=True)              # (T, 1) any
                k = band * 5 + dj_idx
                # accumulate as a bitmask: bit k contributes 2^k; lanes
                # summed on the XLA side into one int32 per query
                acc_ref[:] += jnp.where(lane == k, bit * float(1 << k), 0.0)

        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile", "window", "eps"))
def _cc_pallas_call(lo, n_live, pts2_sorted, nums_i, nums_f, *, tile, window,
                    eps):
    # Queries and refs are the SAME sorted 2D points here, so only ONE raw
    # (V, 2) coordinate array crosses the wire (~0.8 MB at 96k candidates vs
    # ~6 MB for the two host-built feature layouts); cell indices, valid
    # flags and both matrices are derived in-jit (see ops/pallas_vert.py).
    # ``nums_i`` = int32 [n, min_i, min_j]; ``nums_f`` = f32
    # [cell, inv_cell].  Cell indices come from floor(x * inv_cell) with the
    # host's exact f32 reciprocal (f32 multiply is IEEE on the TPU VPU, f32
    # division is not — see ops/pallas_vert.py).  The
    # (Q, 128) bit-weighted accumulator still reduces to ONE int32 bitmask
    # per query before D2H (the full block was ~74 MB over the tunnel).
    v_pad = pts2_sorted.shape[0]
    nq = lo.shape[1] * tile
    n, mins = nums_i[0], nums_i[1:3]
    inv_cell = nums_f[1]

    rvalid = (jnp.arange(v_pad, dtype=jnp.int32) < n)
    ij = (jnp.floor(pts2_sorted * inv_cell).astype(jnp.int32)
          - mins[None, :]).astype(jnp.float32)
    ij = jnp.where(rvalid[:, None], ij, 0.0)
    ref_mat = (jnp.zeros((8, v_pad), jnp.float32)
               .at[0, :].set(rvalid.astype(jnp.float32))
               .at[1:3, :].set(pts2_sorted.T)
               .at[3:5, :].set(ij.T))
    q_mat = (jnp.zeros((nq, 128), jnp.float32)
             .at[:, 0:2].set(pts2_sorted[:nq])
             .at[:, 2:4].set(ij[:nq])
             .at[:, 4].set(rvalid[:nq].astype(jnp.float32)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq // tile,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, window), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_cc_kernel, window=window, tile=tile, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(lo, n_live, q_mat, ref_mat)
    # cast BEFORE summing: each lane (bit_k * 2^k, k <= 24) is f32-exact but
    # the 25-bit sum can exceed f32's 24-bit integer range
    return jnp.sum(acc[:, :25].astype(jnp.int32), axis=1)


def _found_bits_numpy(pts_sorted, keys_sorted, ij_sorted, idx, eps,
                      chunk=None):
    """Chunked numpy fallback: exact 25-cell found bits for the ``idx`` rows
    of the sorted point set.  Bounded memory: one (chunk, occ_cap) block per
    neighbor cell at a time; the chunk adapts to the fullest cell so the
    block stays ~100 MB even when a coarse eps puts everything in one cell
    (the HDBSCAN ladder's top levels)."""
    n = len(pts_sorted)
    eps2 = eps * eps
    if chunk is None:
        _, counts = np.unique(keys_sorted, return_counts=True)
        max_occ = int(counts.max()) if len(counts) else 1
        chunk = int(np.clip(2.5e7 // max(max_occ, 1), 64, 8192))
    found = np.zeros((len(idx), 25), bool)
    for lo in range(0, len(idx), chunk):
        sel = idx[lo:lo + chunk]
        qx = pts_sorted[sel, 0:1]
        qy = pts_sorted[sel, 1:2]
        qij = ij_sorted[sel]
        for c, (di, dj) in enumerate((di, dj) for di in range(-2, 3)
                                     for dj in range(-2, 3)):
            key = (qij[:, 0] + di).astype(np.int64) * _GRID_WIDTH \
                + (qij[:, 1] + dj)
            s = np.searchsorted(keys_sorted, key, side="left")
            e = np.searchsorted(keys_sorted, key, side="right")
            span = int((e - s).max()) if len(s) else 0
            if span == 0:
                continue
            offs = np.arange(span)
            cand = np.minimum(s[:, None] + offs[None, :], n - 1)
            ok = offs[None, :] < (e - s)[:, None]
            d2 = (np.square(pts_sorted[cand, 0] - qx)
                  + np.square(pts_sorted[cand, 1] - qy))
            found[lo:lo + chunk, c] = (ok & (d2 <= eps2)).any(axis=1)
    return found


def cc_labels_banded(points_xy: np.ndarray, eps: float,
                     tile: int = DEFAULT_TILE,
                     window: int | None = None,
                     max_window: int = DEFAULT_WINDOW) -> np.ndarray:
    """Connected components of the eps-ball graph over 2D ``points_xy``:
    (N,) int64 labels, each the minimum original index of its component
    (same contract as ops/cluster.py:connected_components_2d on live rows).

    Device: banded found-bits kernel (overflow tiles re-done by the numpy
    fallback); ``window`` defaults to the smallest power of two covering the
    widest actual band span (capped at ``max_window``).  Host:
    clique-representative edges + scipy union-find.
    """
    pts = np.ascontiguousarray(points_xy[:, :2], np.float32)
    n = len(pts)
    if n == 0:
        return np.zeros(0, np.int64)
    cell = np.float32(float(eps) / np.sqrt(2.0))

    # same f32 reciprocal-multiply as the device (_cc_pallas_call)
    inv_cell = np.float32(1.0) / cell
    ij = np.floor(pts * inv_cell).astype(np.int64)
    mins_ij = ij.min(axis=0)
    ij -= mins_ij
    keys = ij[:, 0] * _GRID_WIDTH + ij[:, 1]
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    spts = pts[order]
    sij = ij[order]

    ntiles = int(np.ceil(n / tile))
    q_pad = ntiles * tile

    k_min = skeys[np.arange(ntiles) * tile]
    k_max = skeys[np.minimum((np.arange(ntiles) + 1) * tile, n) - 1]
    lo_raw = np.zeros((5, ntiles), np.int64)
    hi_raw = np.zeros((5, ntiles), np.int64)
    for band, di in enumerate(range(-2, 3)):
        lo_raw[band] = (np.searchsorted(skeys, k_min + di * _GRID_WIDTH - 2,
                                        "left") // _ALIGN) * _ALIGN
        hi_raw[band] = np.searchsorted(skeys, k_max + di * _GRID_WIDTH + 3,
                                       "left")
    if window is None:
        span = int((hi_raw - lo_raw).max()) if ntiles else _ALIGN
        window = int(min(max(1 << int(np.ceil(np.log2(max(span, _ALIGN)))),
                             _ALIGN), max_window))

    # pow2 bucket: stable jit shapes across calls (see pallas_vert); always
    # >= q_pad (the smallest pow2 64-multiple >= n bounds ceil64(n))
    v_pad = max(1 << int(np.ceil(np.log2(max(n, _ALIGN)))), window)
    lo = np.clip(lo_raw, 0, v_pad - window).astype(np.int32)
    overflow_tiles = (hi_raw > lo + window).any(axis=0)

    pts2_sorted = np.zeros((v_pad, 2), np.float32)
    pts2_sorted[:n] = spts
    nums_i = np.asarray([n, mins_ij[0], mins_ij[1]], np.int32)
    nums_f = np.asarray([cell, inv_cell], np.float32)

    masks = np.asarray(_cc_pallas_call(
        jnp.asarray(lo), jnp.asarray([n], np.int32),
        jnp.asarray(pts2_sorted), jnp.asarray(nums_i), jnp.asarray(nums_f),
        tile=tile, window=window, eps=float(eps)))
    found = (((masks[:n, None] >> np.arange(25)[None, :]) & 1)
             .astype(bool))

    over = np.repeat(overflow_tiles, tile)[:n]
    if over.any():
        idx = np.where(over)[0]
        found[idx] = _found_bits_numpy(spts, skeys, sij, idx, float(eps))

    # union-find on the CELL graph, not the point graph: each cell is a
    # clique (cell = eps/sqrt2), so cell-level connectivity (cells A, B
    # adjacent iff ANY member of A found B) has identical components — and
    # ~6-10x fewer edges for scipy at forest densities.
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as scipy_cc

    first = np.ones(n, bool)
    first[1:] = skeys[1:] != skeys[:-1]
    cell_id = np.cumsum(first) - 1          # (n,) sorted-space cell index
    n_cells = int(cell_id[-1]) + 1
    starts = np.flatnonzero(first)

    # OR-reduce found bits per cell (reduceat over the sorted point rows;
    # ``found`` already includes the overflow-tile corrections)
    cell_found = np.bitwise_or.reduceat(found, starts, axis=0)

    # neighbor cell index per (cell, offset): locate the neighbor's key
    cell_keys = skeys[starts]
    cij = np.stack([cell_keys // _GRID_WIDTH, cell_keys % _GRID_WIDTH], axis=1)
    qi = cij[:, 0:1] + np.arange(-2, 3).repeat(5)[None, :]
    qj = cij[:, 1:2] + np.tile(np.arange(-2, 3), 5)[None, :]
    nbr_keys = qi.astype(np.int64) * _GRID_WIDTH + qj
    nbr_cell = np.searchsorted(cell_keys, nbr_keys.ravel(),
                               side="left").reshape(n_cells, 25)

    src = np.broadcast_to(np.arange(n_cells)[:, None],
                          (n_cells, 25))[cell_found]
    dst = np.minimum(nbr_cell, n_cells - 1)[cell_found]
    graph = coo_matrix((np.ones(len(src), np.int8), (src, dst)),
                       shape=(n_cells, n_cells))
    _, cell_comp = scipy_cc(graph, directed=False)
    comp = cell_comp[cell_id]               # (n,) per point

    # stable ids: minimum ORIGINAL index per component, in original order
    comp_min = np.full(comp.max() + 1, n, np.int64)
    np.minimum.at(comp_min, comp, order)
    labels = np.empty(n, np.int64)
    labels[order] = comp_min[comp]
    return labels
