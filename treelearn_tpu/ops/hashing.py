"""Voxel-key hashing primitives: the static-shape backbone of the sparse engine.

The reference relies on spconv's CUDA hash tables for voxel identity
(reference: tree_learn/model/tree_learn.py:129-167 and spconv's indice_key
rulebooks).  On TPU we instead keep every level's active-voxel set as a
*sorted* int32 linear-key array with a fixed capacity, padded with a sentinel;
membership queries are vectorized binary searches, and deduplication is a
sort + flag-first-occurrence pass.  All shapes are static, which is what lets
XLA compile the whole U-Net as one program.

Keys are linear indices ``(((b * X + x) * Y + y) * Z + z)`` over the padded
spatial shape.  With the reference's pipeline shape [500, 500, 1000] and batch
sizes <= 4 the key range (1e9) fits comfortably in int32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sentinel key for padding / invalid entries. Sorts to the end.
SENTINEL = jnp.iinfo(jnp.int32).max


def encode_keys(coords: jnp.ndarray, spatial_shape, batch_size=None) -> jnp.ndarray:
    """Encode (V, 4) int32 ``(b, x, y, z)`` voxel coords into sorted-friendly keys.

    Out-of-range or negative coords map to SENTINEL.  ``spatial_shape`` may be a
    traced (3,) int32 array or a static tuple.
    """
    sx, sy, sz = spatial_shape[0], spatial_shape[1], spatial_shape[2]
    b, x, y, z = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    key = ((b * sx + x) * sy + y) * sz + z
    in_range = (
        (x >= 0) & (x < sx) & (y >= 0) & (y < sy) & (z >= 0) & (z < sz) & (b >= 0)
    )
    return jnp.where(in_range, key.astype(jnp.int32), SENTINEL)


def decode_keys(keys: jnp.ndarray, spatial_shape) -> jnp.ndarray:
    """Decode int32 keys back to (V, 4) ``(b, x, y, z)``; SENTINEL rows become -1."""
    sx, sy, sz = spatial_shape[0], spatial_shape[1], spatial_shape[2]
    z = keys % sz
    r = keys // sz
    y = r % sy
    r = r // sy
    x = r % sx
    b = r // sx
    coords = jnp.stack([b, x, y, z], axis=1).astype(jnp.int32)
    return jnp.where((keys == SENTINEL)[:, None], -1, coords)


def sort_unique(keys: jnp.ndarray, capacity: int):
    """Deduplicate keys into a sorted, capacity-padded table.

    Returns:
      unique_keys: (capacity,) int32, ascending, padded with SENTINEL.
      inverse:     (N,) int32 mapping each input row to its unique slot.
                   Rows whose key is SENTINEL (or that overflow capacity) get
                   ``capacity`` — use scatter ``mode='drop'`` / masked gathers.
      n_unique:    () int32 number of live unique keys (may exceed capacity;
                   callers should check for overflow on the host).
    """
    n = keys.shape[0]
    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    live = sorted_keys != SENTINEL
    first = first & live
    n_unique = first.sum().astype(jnp.int32)
    uid = (jnp.cumsum(first) - 1).astype(jnp.int32)
    uid = jnp.where(live & (uid < capacity), uid, capacity)
    inverse = jnp.zeros((n,), jnp.int32).at[order].set(uid)
    unique_keys = (
        jnp.full((capacity,), SENTINEL, dtype=jnp.int32)
        .at[uid]
        .set(sorted_keys, mode="drop")
    )
    return unique_keys, inverse, n_unique


def table_unique(keys: jnp.ndarray, capacity: int, table_size: int):
    """:func:`sort_unique` without the sort, for keys with a STATIC bounded
    range: scatter an occupancy bit per key into a dense table, prefix-sum it,
    and read each key's rank.  Table index order == key order, so the unique
    set comes out ascending exactly like the sorted variant.

    One argsort per U-Net level was ~3.3 MB of TPU code and ~1 ms; the
    occupancy pass is a scatter + cumsum over the (static) key space, which
    the downsample levels already materialize as their probe tables.

    Same contract as :func:`sort_unique`; keys >= table_size (including
    SENTINEL) count as invalid.
    """
    n = keys.shape[0]
    occ = jnp.zeros((table_size,), jnp.int32).at[keys].set(1, mode="drop")
    cum = jnp.cumsum(occ)
    n_unique = cum[-1].astype(jnp.int32)
    slot = jnp.take(cum - 1, keys, mode="fill",
                    fill_value=capacity).astype(jnp.int32)
    valid = (keys >= 0) & (keys < table_size)
    inverse = jnp.where(valid & (slot < capacity), slot, capacity)
    unique_keys = (
        jnp.full((capacity,), SENTINEL, dtype=jnp.int32)
        .at[inverse]
        .set(keys, mode="drop")
    )
    return unique_keys, inverse, n_unique


def lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Binary-search membership: index of each query in ``sorted_keys`` or -1.

    ``sorted_keys`` must be ascending with SENTINEL padding (as produced by
    :func:`sort_unique`).
    """
    pos = jnp.searchsorted(sorted_keys, queries)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1).astype(jnp.int32)
    found = (sorted_keys[pos] == queries) & (queries != SENTINEL)
    return jnp.where(found, pos, -1)


def segment_rank(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Rank of each row within its run of equal sorted keys (0, 1, 2, ...).

    Used to replicate PointToVoxel's "first max_num_points_per_voxel points in
    scan order" selection (reference tree_learn.py:141): a stable sort by key
    preserves scan order within a voxel, so rank < k selects the first k.
    """
    n = sorted_keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    seg_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    return pos - seg_start
