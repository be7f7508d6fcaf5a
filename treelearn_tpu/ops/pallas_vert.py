"""Pallas TPU kernel for verticality: banded neighborhood moment reduction.

The XLA verticality pass (ops/features.py:_verticality_pass) is gather-bound:
per query it gathers up to 9*cell_cap candidate rows through XLA's slow TPU
row gather (~20 s for 220k queries on v5e).  But the neighbor structure is the
same banded structure the sparse convs exploit (ops/pallas_conv.py): sort refs
AND queries by their xy cell key (cell = search_radius) and the 3x3 cell
neighborhood of a tile of T consecutive queries falls into three contiguous
windows of the sorted ref array (one per cell-row band di in {-1,0,1}).

The kernel therefore never gathers: per (tile, band) it DMAs one contiguous
(8, window) block of the feature-major ref matrix (sequential HBM read;
feature-major so window columns are already lane-oriented — feature-minor
layouts forced sublane->lane transposes of (window,) vectors, which the
Mosaic compiler handles pathologically), builds the exact neighbor mask on
the VPU

    M[t, r] = (d2(t, r) <= radius^2) & (ref_cell_row == query_cell_row + di)
              & (|ref_cell_col - query_cell_col| <= 1) & valid

and accumulates all ten neighborhood moments (count, Sx, Sy, Sz, Sxx, Sxy,
Sxz, Syy, Syz, Szz) as masked lane reductions in f32 (full precision — the
covariance comes from an E[x^2]-E[x]^2 cancellation, so bf16-truncated MXU
arithmetic is not acceptable here).  Coordinates are re-centered per tile
(first query row) so the f32 moments stay far from cancellation.  The
closed-form symmetric 3x3 eigensolver (ops/features.py:verticality_from_cov6)
runs on the XLA side of the same jit (it needs acos, which Mosaic does not
lower).

Exactness: unlike the capped/strided XLA pass this kernel counts EVERY
neighbor within the radius (the cell-match mask de-duplicates rows shared by
overlapping band windows).  Host-side span checks route queries of any tile
whose neighborhood overflows the window to the XLA fallback, so results never
silently drop neighbors.

Reference semantics: jakteristics verticality, search radius 0.6
(reference tree_learn/util/data_preparation.py:83-100).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile/window sizing: a band window must cover every ref row of the tile's
# key range +-1 cell column; a tile whose queries cross a grid ROW boundary
# needs the whole row in-window, so windows are sized generously and tiles
# kept small (measured on the bench forest: tile 64 / window 4096 -> zero
# overflow; tile 256 / window 1024 -> 85% overflow).  VMEM of the (tile,
# window) f32 intermediates bounds the product.
DEFAULT_TILE = 64
DEFAULT_WINDOW = 4096
_ALIGN = 128         # lane-dim DMA slices must start 128-aligned
_GRID_WIDTH = 30000  # matches ops/cluster.py cell-key stride

_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"

# ref matrix rows (feature-major, (8, V)): [valid, x, y, z, cell_i, cell_j]
# query matrix columns ((Q, 128)): [x, y, z, cell_i, cell_j, valid]


def _vert_kernel(lo_ref, n_live_ref, q_ref, refs_hbm, out_ref, window_buf,
                 acc_ref, sems, *, window, tile, radius):
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

        # per-tile re-centering keeps the f32 second moments far from
        # cancellation (local offsets are O(window span), not O(plot extent))
        cx, cy, cz = q_ref[0, 0], q_ref[0, 1], q_ref[0, 2]
        qx = q_ref[:, 0:1] - cx          # (T, 1)
        qy = q_ref[:, 1:2] - cy
        qz = q_ref[:, 2:3] - cz
        qi = q_ref[:, 3:4]
        qj = q_ref[:, 4:5]
        qvalid = q_ref[:, 5:6] > 0.0

        r2 = jnp.float32(radius * radius)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        for band in range(3):
            slot = band % 2
            if band + 1 < 3:
                dma(band + 1, (band + 1) % 2).start()
            dma(band, slot).wait()

            win = window_buf[slot]            # (8, W) feature-major
            wvalid = win[0:1, :]              # (1, W)
            wx = win[1:2, :] - cx
            wy = win[2:3, :] - cy
            wz = win[3:4, :] - cz
            wi = win[4:5, :]
            wj = win[5:6, :]

            dx = wx - qx                      # (T, W)
            dy = wy - qy
            dz = wz - qz
            d2 = dx * dx + dy * dy + dz * dz

            di = jnp.float32(band - 1)
            mask = ((d2 <= r2)
                    & (wi == qi + di)
                    & (jnp.abs(wj - qj) <= 1.0)
                    & (wvalid > 0.0)
                    & qvalid)
            m = mask.astype(jnp.float32)

            moments = (m, m * wx, m * wy, m * wz,
                       m * wx * wx, m * wx * wy, m * wx * wz,
                       m * wy * wy, m * wy * wz, m * wz * wz)
            for k, mom in enumerate(moments):
                s = jnp.sum(mom, axis=1, keepdims=True)     # (T, 1)
                acc_ref[:] += jnp.where(lane == k, s, 0.0)

        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile", "window", "radius"))
def _vert_pallas_call(lo, n_live, q_pts, pts_sorted, nums, *, tile, window,
                      radius):
    # Build BOTH feature matrices on device from the raw sorted coordinates:
    # the host-built (8, V) ref matrix + (Q, 8) query matrix shipped ~19 MB
    # per call through the tunnel, of which everything except the coordinates
    # themselves (7 MB) is derivable in-jit (cell indices are floor(x/cell),
    # valid flags are iota comparisons).  H2D upload was ~60% of the warm
    # banded-call time (0.27 s of 0.46 s on the 156k-query bench plot).
    # ``nums`` = int32 [nq, nr, min_i, min_j] (mins over refs AND queries,
    # host-computed so device cell indices match the host span tables).
    nq_pad = q_pts.shape[0]
    v_pad = pts_sorted.shape[0]
    # cell index = floor(x * inv_cell), NEVER floor(x / cell): f32 multiply
    # is correctly rounded on the TPU VPU, but f32 division lowers to a
    # reciprocal refinement that may round differently from the host's IEEE
    # division — a 1-ulp drift at a cell boundary would silently break the
    # band mask against the host-built span tables.  The host mirror
    # (verticality_banded) uses the identical f32 constant and multiply.
    inv_cell = jnp.float32(np.float32(1.0) / np.float32(radius))
    n_q, n_r = nums[0], nums[1]
    mins = nums[2:4]

    ij_q = (jnp.floor(q_pts[:, :2] * inv_cell).astype(jnp.int32)
            - mins[None, :]).astype(jnp.float32)
    qvalid = (jnp.arange(nq_pad, dtype=jnp.int32) < n_q)
    q_mat = (jnp.zeros((nq_pad, 128), jnp.float32)
             .at[:, 0:3].set(q_pts)
             .at[:, 3:5].set(ij_q)
             .at[:, 5].set(qvalid.astype(jnp.float32)))

    rvalid = (jnp.arange(v_pad, dtype=jnp.int32) < n_r)
    ij_r = (jnp.floor(pts_sorted[:, :2] * inv_cell).astype(jnp.int32)
            - mins[None, :]).astype(jnp.float32)
    ref_mat = (jnp.zeros((8, v_pad), jnp.float32)
               .at[0, :].set(rvalid.astype(jnp.float32))
               .at[1:4, :].set(pts_sorted.T)
               .at[4:6, :].set(jnp.where(rvalid[None, :], ij_r.T, 0.0)))
    nq = nq_pad
    ntiles = nq // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),  # query tile
            pl.BlockSpec(memory_space=pltpu.HBM),                 # refs (8, V)
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, window), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_vert_kernel, window=window, tile=tile,
                          radius=radius),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(lo, n_live, q_mat, ref_mat)

    from .features import verticality_from_cov6

    cnt = acc[:, 0]
    c = jnp.maximum(cnt, 1.0)
    ex, ey, ez = acc[:, 1] / c, acc[:, 2] / c, acc[:, 3] / c
    cov_xx = acc[:, 4] / c - ex * ex
    cov_xy = acc[:, 5] / c - ex * ey
    cov_xz = acc[:, 6] / c - ex * ez
    cov_yy = acc[:, 7] / c - ey * ey
    cov_yz = acc[:, 8] / c - ey * ez
    cov_zz = acc[:, 9] / c - ez * ez
    nz = verticality_from_cov6(cov_xx, cov_xy, cov_xz, cov_yy, cov_yz, cov_zz)
    return jnp.stack([1.0 - nz, cnt], axis=1).astype(jnp.float16)


def verticality_banded(points: np.ndarray, queries: np.ndarray,
                       search_radius: float, tile: int = DEFAULT_TILE,
                       window: int | None = None,
                       max_window: int = DEFAULT_WINDOW,
                       return_device_refs: bool = False):
    """Exact radius-neighborhood verticality of ``queries`` against ``points``.

    Host orchestration: numpy sorts both sides by xy cell key and computes the
    per-(band, tile) window starts with vectorized searchsorted; the device
    only runs the dense banded kernel.  ``window`` defaults to the smallest
    power of two covering the widest actual band span (capped at
    ``max_window`` — window width is pure DMA cost).  Returns (vert (Q,),
    cnt (Q,), overflow_mask (Q,) bool) in the original query order — entries
    of overflowing tiles are NOT computed (caller routes them to the XLA
    pass).

    With ``return_device_refs`` a 4th element is appended: the device-resident
    padded sorted ref coordinates ((v_pad, 3) f32 jax array, rows >= n_ref
    zero) with the live-row count — the XLA straggler pass reuses it instead
    of uploading the ref cloud a second time.
    """
    points = np.asarray(points, np.float32)
    queries = np.asarray(queries, np.float32)
    nr, nq = len(points), len(queries)
    cell = float(search_radius)
    width = _GRID_WIDTH

    # multiply by the f32 reciprocal, floor — the EXACT formula the device
    # uses in _vert_pallas_call (f32 multiply is IEEE on both sides; f32
    # division is not guaranteed so on the TPU VPU)
    inv_cell = np.float32(1.0) / np.float32(cell)
    ij_r = np.floor(points[:, :2] * inv_cell).astype(np.int64)
    ij_q = np.floor(queries[:, :2] * inv_cell).astype(np.int64)
    mins = np.minimum(ij_r.min(axis=0), ij_q.min(axis=0))
    ij_r -= mins
    ij_q -= mins
    keys_r = ij_r[:, 0] * width + ij_r[:, 1]
    keys_q = ij_q[:, 0] * width + ij_q[:, 1]

    order_r = np.argsort(keys_r, kind="stable")
    order_q = np.argsort(keys_q, kind="stable")
    skeys_r = keys_r[order_r]
    skeys_q = keys_q[order_q]

    ntiles = int(np.ceil(nq / tile))
    q_pad = ntiles * tile

    # per-(band, tile) window spans over the sorted refs
    k_min = skeys_q[np.arange(ntiles) * tile]
    last = np.minimum((np.arange(ntiles) + 1) * tile, nq) - 1
    k_max = skeys_q[last]
    lo_raw = np.zeros((3, ntiles), np.int64)
    hi_raw = np.zeros((3, ntiles), np.int64)
    for band, di in enumerate((-1, 0, 1)):
        lo_raw[band] = (np.searchsorted(skeys_r, k_min + di * width - 1,
                                        side="left") // _ALIGN) * _ALIGN
        hi_raw[band] = np.searchsorted(skeys_r, k_max + di * width + 1,
                                       side="right")
    if window is None:
        span = int((hi_raw - lo_raw).max()) if ntiles else _ALIGN
        window = int(min(max(1 << int(np.ceil(np.log2(max(span, _ALIGN)))),
                             _ALIGN), max_window))

    # pow2 bucket (not just 128-aligned): keeps the jit shape stable across
    # plots of similar size, and the XLA straggler pass reuses this array at
    # the same shape (ops/features.py) — its compile key must not vary per
    # plot
    v_pad = max(1 << int(np.ceil(np.log2(max(nr, _ALIGN)))), window)
    lo = np.clip(lo_raw, 0, v_pad - window).astype(np.int32)
    overflow_tiles = (hi_raw > lo + window).any(axis=0)

    # only raw sorted coordinates cross the wire; cell indices, valid flags
    # and the feature-major layouts are built in-jit (_vert_pallas_call)
    pts_sorted = np.zeros((v_pad, 3), np.float32)
    pts_sorted[:nr] = points[order_r]
    q_pts = np.zeros((q_pad, 3), np.float32)
    q_pts[:nq] = queries[order_q]
    nums = np.asarray([nq, nr, mins[0], mins[1]], np.int32)

    n_live = np.asarray([nq], np.int32)
    pts_dev = jnp.asarray(pts_sorted)
    out = _vert_pallas_call(jnp.asarray(lo), jnp.asarray(n_live),
                            jnp.asarray(q_pts), pts_dev, jnp.asarray(nums),
                            tile=tile, window=window,
                            radius=float(search_radius))
    out_np = np.asarray(out, np.float32)

    vert_sorted = out_np[:nq, 0]
    cnt_sorted = out_np[:nq, 1]
    over_sorted = np.repeat(overflow_tiles, tile)[:nq]

    inv = np.empty(nq, np.int64)
    inv[order_q] = np.arange(nq)
    if return_device_refs:
        return (vert_sorted[inv], cnt_sorted[inv], over_sorted[inv],
                (pts_dev, nr))
    return vert_sorted[inv], cnt_sorted[inv], over_sorted[inv]
