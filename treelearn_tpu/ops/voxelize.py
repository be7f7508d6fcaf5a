"""Point→voxel pooling and voxel→point gathering (devoxelization).

TPU-native replacement for spconv's ``PointToVoxel`` + the nan-mean pooling in
the reference model (reference: tree_learn/model/tree_learn.py:129-167):
one stable sort by voxel key replaces the CUDA hash build, and the
"first ``max_pts`` points per voxel in scan order" selection falls out of the
stable ordering for free.  Everything is static-shape / jit-compatible: callers
pass padded point arrays plus a ``valid`` mask and a static voxel ``capacity``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hashing import SENTINEL, decode_keys, encode_keys


class VoxelizedBatch(NamedTuple):
    """Result of :func:`voxelize_points`."""

    voxel_feats: jnp.ndarray    # (capacity, F) pooled features, zero padding
    voxel_coords: jnp.ndarray   # (capacity, 4) int32 (b, x, y, z), -1 padding
    voxel_keys: jnp.ndarray     # (capacity,) sorted int32 keys, SENTINEL padding
    v2p_map: jnp.ndarray        # (N,) int32 point -> voxel slot; == capacity for invalid points
    n_voxels: jnp.ndarray       # () int32 live voxel count
    spatial_shape: jnp.ndarray  # (3,) int32 (X, Y, Z) grid extent used for keys


def compute_voxel_ijk(
    coords: jnp.ndarray,
    batch_ids: jnp.ndarray,
    valid: jnp.ndarray,
    batch_size: int,
    voxel_size: float,
) -> jnp.ndarray:
    """Integer voxel coordinates relative to each batch element's min corner.

    Parity with PointToVoxel's ``coors_range = [min, max + eps]`` grid
    (reference tree_learn.py:134-143): index = floor((p - min_b) / voxel_size).
    """
    big = jnp.float32(3e38)
    masked = jnp.where(valid[:, None], coords, big)
    mins = (
        jnp.full((batch_size, 3), big, dtype=coords.dtype)
        .at[batch_ids]
        .min(masked, mode="drop")
    )
    rel = coords - mins[jnp.clip(batch_ids, 0, batch_size - 1)]
    return jnp.floor(rel / voxel_size).astype(jnp.int32)


def voxelize_points(
    coords: jnp.ndarray,
    feats: jnp.ndarray,
    batch_ids: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    batch_size: int,
    voxel_size: float,
    capacity: int,
    max_pts: int = 3,
    spatial_shape: Optional[jnp.ndarray] = None,
    use_coords: bool = False,
    use_feats: bool = False,
) -> VoxelizedBatch:
    """Voxelize a flat point batch into a capacity-padded sparse voxel grid.

    Feature semantics follow the reference model's voxelize
    (tree_learn.py:149-156): the pooled per-voxel feature is the mean of the
    first ``max_pts`` points (scan order) of ``[coords | feats]``; the coord part
    is overwritten with ones unless ``use_coords``, the feat part unless
    ``use_feats``; the output feature order is ``[feats | coords]``.

    Points falling outside ``spatial_shape`` are clamped onto the boundary so the
    v2p map stays total (the reference asserts no unmapped points,
    tree_learn.py:144).
    """
    n = coords.shape[0]
    ijk = compute_voxel_ijk(coords, batch_ids, valid, batch_size, voxel_size)

    if spatial_shape is None:
        big = jnp.int32(-(2**30))
        maxs = jnp.max(jnp.where(valid[:, None], ijk, big), axis=0)
        spatial_shape = maxs + 1
    else:
        spatial_shape = jnp.asarray(spatial_shape, dtype=jnp.int32)
    ijk = jnp.clip(ijk, 0, spatial_shape[None, :] - 1)

    bxyz = jnp.concatenate([batch_ids[:, None].astype(jnp.int32), ijk], axis=1)
    keys = encode_keys(bxyz, spatial_shape)
    keys = jnp.where(valid, keys, SENTINEL)

    # One stable sort drives dedup, v2p, and first-k pooling.
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    live = sorted_keys != SENTINEL
    first_live = first & live
    n_voxels = first_live.sum().astype(jnp.int32)
    uid = (jnp.cumsum(first_live) - 1).astype(jnp.int32)
    uid = jnp.where(live & (uid < capacity), uid, capacity)
    v2p_map = jnp.zeros((n,), jnp.int32).at[order].set(uid)

    voxel_keys = (
        jnp.full((capacity,), SENTINEL, jnp.int32).at[uid].set(sorted_keys, mode="drop")
    )

    # Pool the first max_pts rows of each voxel.
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    rank = pos - seg_start
    take = (rank < max_pts) & live

    point_feats = jnp.concatenate([coords, feats], axis=1)
    sorted_feats = point_feats[order]
    contrib = jnp.where(take[:, None], sorted_feats, 0.0)
    sums = (
        jnp.zeros((capacity, point_feats.shape[1]), point_feats.dtype)
        .at[uid]
        .add(contrib, mode="drop")
    )
    cnts = (
        jnp.zeros((capacity,), point_feats.dtype)
        .at[uid]
        .add(take.astype(point_feats.dtype), mode="drop")
    )
    pooled = sums / jnp.maximum(cnts, 1.0)[:, None]

    coord_part = pooled[:, :3]
    feat_part = pooled[:, 3:]
    if not use_coords:
        coord_part = jnp.ones_like(coord_part)
    if not use_feats:
        feat_part = jnp.ones_like(feat_part)
    voxel_feats = jnp.concatenate([feat_part, coord_part], axis=1)
    # zero out padding rows
    live_voxel = (voxel_keys != SENTINEL)[:, None]
    voxel_feats = jnp.where(live_voxel, voxel_feats, 0.0)

    voxel_coords = decode_keys(voxel_keys, spatial_shape)
    return VoxelizedBatch(
        voxel_feats=voxel_feats,
        voxel_coords=voxel_coords,
        voxel_keys=voxel_keys,
        v2p_map=v2p_map,
        n_voxels=n_voxels,
        spatial_shape=spatial_shape,
    )


def devoxelize(voxel_feats: jnp.ndarray, v2p_map: jnp.ndarray) -> jnp.ndarray:
    """Gather per-voxel features back to points (reference tree_learn.py:99).

    Invalid points (v2p == capacity) receive zeros.
    """
    capacity = voxel_feats.shape[0]
    safe = jnp.clip(v2p_map, 0, capacity - 1)
    out = voxel_feats[safe]
    return jnp.where((v2p_map < capacity)[:, None], out, 0.0)


def voxel_downsample_trace_np(points, voxel_size: float, round_decimals: int = 2):
    """Host-side voxel downsampling with trace (numpy).

    Replaces open3d's ``voxel_down_sample_and_trace`` in data preparation
    (reference: tree_learn/util/data_preparation.py:60-79): coordinates are
    rounded to 2 decimals, points are bucketed into ``voxel_size`` cubes, each
    surviving voxel gets the *centroid* of its points (open3d semantics) while
    labels/attributes are taken from the first point (by scan order) in the
    voxel, matching ``idx_keep = [item[0] for item in idx]``.

    Returns (down_xyz (V,3), first_idx (V,), inverse (N,) mapping each original
    point to its voxel row).  Voxels are ordered by first occurrence to mirror
    the reference's ordering stability guarantees (only used for traceability,
    not numerics).
    """
    import numpy as np

    pts = np.round(np.asarray(points, dtype=np.float64), round_decimals)
    mins = pts.min(axis=0)
    ijk = np.floor((pts - mins) / voxel_size).astype(np.int64)
    dims = ijk.max(axis=0) + 1
    lin = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]

    order = np.argsort(lin, kind="stable")
    sorted_lin = lin[order]
    first = np.ones(len(pts), dtype=bool)
    first[1:] = sorted_lin[1:] != sorted_lin[:-1]
    uid_sorted = np.cumsum(first) - 1
    inverse = np.empty(len(pts), dtype=np.int64)
    inverse[order] = uid_sorted

    n_vox = int(uid_sorted[-1]) + 1 if len(pts) else 0
    sums = np.zeros((n_vox, 3), dtype=np.float64)
    np.add.at(sums, inverse, pts)
    cnts = np.bincount(inverse, minlength=n_vox).astype(np.float64)
    centroids = sums / cnts[:, None]

    first_idx_sorted = order[first]
    # remap to first-occurrence voxel ordering (ascending first original index)
    occ_order = np.argsort(first_idx_sorted, kind="stable")
    rank = np.empty(n_vox, dtype=np.int64)
    rank[occ_order] = np.arange(n_vox)
    inverse = rank[inverse]
    centroids = centroids[occ_order]
    first_idx = first_idx_sorted[occ_order]
    return centroids, first_idx, inverse


def level_voxel_counts_np(xyz, voxel_size: float, spatial_shape,
                          num_levels: int):
    """Host-side exact per-level active-voxel counts for one batch element.

    Mirrors the device pipeline bit-for-bit: ``compute_voxel_ijk``'s
    min-corner float32 grid, clamping to ``spatial_shape``, and the strided
    k=2 s=2 downsample rule of :func:`treelearn_tpu.ops.sparse.build_downsample`
    (``out_dim = in_dim // 2``; children whose parent falls outside are
    dropped).  Whole-plot inference uses this to size per-level capacities
    exactly instead of assuming the halve-per-level schedule, which
    under-provisions on sparse occlusion-thinned clouds (hard-mode geometry
    keeps ~65% of voxels across the first downsample, not 50%).
    """
    import numpy as np

    p = np.asarray(xyz, np.float32)
    shape = np.asarray(spatial_shape, np.int64)
    ijk = np.floor((p - p.min(axis=0)) / np.float32(voxel_size)).astype(np.int64)
    ijk = np.clip(ijk, 0, shape - 1)

    def dedup(ijk, shape):
        keys = (ijk[:, 0] * shape[1] + ijk[:, 1]) * shape[2] + ijk[:, 2]
        uk = np.unique(keys)
        x, r = np.divmod(uk, shape[1] * shape[2])
        y, z = np.divmod(r, shape[2])
        return np.stack([x, y, z], axis=1)

    cur = dedup(ijk, shape)
    counts = [len(cur)]
    for _ in range(1, num_levels):
        out_shape = shape // 2
        parent = cur // 2
        parent = parent[np.all(parent < out_shape, axis=1)]
        cur = dedup(parent, out_shape)
        counts.append(len(cur))
        shape = out_shape
    return counts


def level_span_windows_np(xyz, voxel_size: float, spatial_shape,
                          num_levels: int, tiles, *, align: int = 128,
                          margin: int = 8, slack: int = 128):
    """Host-side minimal banded-conv window per U-Net level (in voxels).

    Mirrors :func:`level_voxel_counts_np`'s level walk and the span test of
    the rd builder (ops/pallas_rd.py:build_spans_banded): per (band, tile)
    the window must cover ``hi_raw - align_down(lo_raw)`` plus the packed
    2-row ``margin``; ``slack`` absorbs host/device float32 grid-rounding
    drift on boundary voxels.  ``tiles`` is the per-level conv tile size
    (model/blocks.py:level_tile_window).

    This is what replaces the fixed 3x-tile window at plot scale: measured
    windows stay narrow where the density allows (cutting the selection tax
    that scales with window rows) and widen exactly where dense crowns need
    it, instead of overflowing into the whole-batch exact-XLA fallback
    (which at 4M voxels crashed the TPU worker — round-5 10M probe).
    """
    import numpy as np

    p = np.asarray(xyz, np.float32)
    shape = np.asarray(spatial_shape, np.int64)
    ijk = np.floor((p - p.min(axis=0)) / np.float32(voxel_size)).astype(np.int64)
    ijk = np.clip(ijk, 0, shape - 1)

    def dedup_keys(ijk, shape):
        keys = (ijk[:, 0] * shape[1] + ijk[:, 1]) * shape[2] + ijk[:, 2]
        return np.unique(keys)

    def ijk_of(keys, shape):
        x, r = np.divmod(keys, shape[1] * shape[2])
        y, z = np.divmod(r, shape[2])
        return np.stack([x, y, z], axis=1)

    def required_window(keys, shape, tile):
        n = len(keys)
        if n == 0:
            return 0
        sy, sz = int(shape[1]), int(shape[2])
        ntiles = int(np.ceil(n / tile))
        starts = np.arange(ntiles) * tile
        ends = np.minimum(starts + tile, n) - 1
        kmin = keys[starts]
        kmax = keys[ends]
        deltas = np.array([dx * sy * sz + dy * sz
                           for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                          np.int64)[:, None]
        lo_raw = np.searchsorted(keys, kmin[None, :] + deltas - 1, side="left")
        hi_raw = np.searchsorted(keys, kmax[None, :] + deltas + 1, side="right")
        lo_al = (lo_raw // align) * align
        return int((hi_raw - lo_al).max()) + margin

    keys = dedup_keys(ijk, shape)
    out = [required_window(keys, shape, int(tiles[0])) + slack]
    cur = ijk_of(keys, shape)
    for lvl in range(1, num_levels):
        out_shape = shape // 2
        parent = cur // 2
        parent = parent[np.all(parent < out_shape, axis=1)]
        keys = dedup_keys(parent, out_shape)
        out.append(required_window(keys, out_shape, int(tiles[lvl])) + slack)
        cur = ijk_of(keys, out_shape)
        shape = out_shape
    return out
