"""Sparse 3D convolution engine: rulebooks + gather-GEMM-scatter ops.

TPU-native replacement for spconv (reference: tree_learn/model/blocks.py and
spconv's SubMConv3d / SparseConv3d / SparseInverseConv3d).  Design:

* Every U-Net level's active set is a :class:`SparseGrid` — a sorted int32 key
  table with static capacity (see ops/hashing.py).
* **Submanifold conv** (SubMConv3d parity): for each of the K = k^3 kernel
  offsets we precompute a gather index per active voxel by binary-searching the
  neighbor's key in the level's table; the conv is then K gathers + K GEMMs
  accumulated — large, static matmuls that XLA tiles onto the MXU.
* **Strided conv k=2 s=2** (SparseConv3d parity): the output set is the
  deduplicated set of parents ``coord // 2`` (children whose parent would fall
  outside ``floor(shape/2)`` are dropped, matching spconv's valid-window rule);
  each child contributes ``W[corner] @ feat`` scatter-added onto its parent.
* **Inverse conv** (SparseInverseConv3d parity): reuses the strided rulebook
  transposed — exactly spconv's ``indice_key`` sharing (blocks.py:110,123):
  each fine voxel gathers its parent's features through its corner's weight.

Rulebooks are built once per tile and shared across all blocks at a level via
:class:`LevelPlan`, mirroring spconv's indice-dict caching.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .hashing import (SENTINEL, decode_keys, encode_keys, lookup,
                      sort_unique, table_unique)


class SparseGrid(NamedTuple):
    """Active voxel set of one U-Net level (capacity-padded, sorted keys)."""

    keys: jnp.ndarray           # (V,) sorted int32, SENTINEL padding
    coords: jnp.ndarray         # (V, 4) int32 (b, x, y, z), -1 padding
    spatial_shape: jnp.ndarray  # (3,) int32
    n_active: jnp.ndarray       # () int32

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def live_mask(self) -> jnp.ndarray:
        return self.keys != SENTINEL


def grid_from_coords(coords: jnp.ndarray, spatial_shape, capacity: int) -> Tuple[SparseGrid, jnp.ndarray]:
    """Build a SparseGrid from possibly-unsorted (N, 4) coords.

    Returns the grid and the (N,) inverse map into it.
    """
    spatial_shape = jnp.asarray(spatial_shape, jnp.int32)
    keys = encode_keys(coords, spatial_shape)
    unique_keys, inverse, n_active = sort_unique(keys, capacity)
    grid = SparseGrid(
        keys=unique_keys,
        coords=decode_keys(unique_keys, spatial_shape),
        spatial_shape=spatial_shape,
        n_active=n_active,
    )
    return grid, inverse


def grid_from_sorted_keys(keys: jnp.ndarray, spatial_shape, n_active) -> SparseGrid:
    spatial_shape = jnp.asarray(spatial_shape, jnp.int32)
    return SparseGrid(
        keys=keys,
        coords=decode_keys(keys, spatial_shape),
        spatial_shape=spatial_shape,
        n_active=jnp.asarray(n_active, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Rulebooks
# ---------------------------------------------------------------------------

def kernel_offsets(kernel_size: int) -> jnp.ndarray:
    """(K, 3) int32 offsets, lexicographic (dx slowest) — matches the layout of
    spconv weights ``(out, kx, ky, kz, in)`` after our importer's transpose."""
    r = kernel_size // 2
    ax = jnp.arange(-r, kernel_size - r, dtype=jnp.int32)
    dx, dy, dz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([dx.ravel(), dy.ravel(), dz.ravel()], axis=1)


def build_dense_table(grid: SparseGrid, table_size: int) -> jnp.ndarray:
    """Direct-address lookup table: table[key] = voxel slot, -1 if inactive.

    ``table_size`` must be >= batch_size * prod(spatial_shape) (static).  This
    is the TPU answer to spconv's GPU hash table: one O(V) scatter per level,
    then every rulebook probe is a single O(1) gather instead of a binary
    search (measured 25x faster than searchsorted at 1M voxels on v5e).
    """
    v = grid.capacity
    iota = jnp.arange(v, dtype=jnp.int32)
    # SENTINEL keys fall outside table_size -> dropped by the scatter
    return jnp.full((table_size,), -1, jnp.int32).at[grid.keys].set(
        iota, mode="drop")


def build_subm_rulebook(grid: SparseGrid, kernel_size: int,
                        dense_table: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather table for a submanifold conv: (K, V) int32 into V, -1 = no input.

    out[i] = sum_k W[k] @ feat[rule[k, i]]   (rule[center, i] == i for live rows)

    Neighbor probes are input-gathers at out + offset (the cross-correlation
    convention of torch/spconv SubMConv3d), scanned over the K offsets — a
    python loop would emit K copies of the probe code into every one of the
    model's 7 level builds (executable size; see ops/pallas_conv.py).

    With ``dense_table`` (see :func:`build_dense_table`) each probe is one
    gather; otherwise falls back to binary search over the sorted keys.
    """
    offs = kernel_offsets(kernel_size)  # (K, 3)
    coords = grid.coords               # (V, 4)
    live = grid.live_mask

    def probe(_, off_k):
        nbr_coords = jnp.concatenate(
            [coords[:, :1], coords[:, 1:] + off_k[None, :]], axis=1)
        nbr_keys = jnp.where(live, encode_keys(nbr_coords, grid.spatial_shape),
                             SENTINEL)
        if dense_table is not None:
            row = jnp.take(dense_table, nbr_keys, mode="fill", fill_value=-1)
        else:
            row = lookup(grid.keys, nbr_keys)
        return None, row

    _, rule = jax.lax.scan(probe, None, offs)
    return rule


class DownsampleRulebook(NamedTuple):
    """Child→parent map for a k=2 s=2 strided conv and its transposed inverse."""

    parent_idx: jnp.ndarray  # (V_in,) int32 into V_out, -1 = dropped child
    corner: jnp.ndarray      # (V_in,) int32 in [0, 8): child corner within parent
    out_grid: SparseGrid


def build_downsample(grid: SparseGrid, out_capacity: int,
                     out_table_size: Optional[int] = None) -> DownsampleRulebook:
    """Output set + rulebook of a SparseConv3d(k=2, s=2, pad=0).

    spconv's valid-window rule: output dim = floor((in - 2) / 2) + 1 = in // 2;
    children with ``coord // 2 >= out_dim`` (the last slice of an odd axis) have
    no valid window and are dropped.  This is what makes the reference's
    "reach zero!!!" failure (util/pipeline.py:91-97) structurally impossible
    here: shapes are static and the drop is just a masked scatter.

    With a static spatial shape, ``out_table_size`` (= batch * prod(shape//2))
    switches the parent dedup from argsort to the sort-free occupancy-table
    pass (ops/hashing.py:table_unique).
    """
    out_shape = grid.spatial_shape // 2
    child = grid.coords  # (V_in, 4)
    parent_xyz = child[:, 1:] // 2
    valid = jnp.all(parent_xyz < out_shape[None, :], axis=1) & grid.live_mask
    parent_coords = jnp.concatenate([child[:, :1], parent_xyz], axis=1)
    parent_keys = encode_keys(parent_coords, out_shape)
    parent_keys = jnp.where(valid, parent_keys, SENTINEL)

    if out_table_size is not None:
        unique_keys, parent_idx, n_out = table_unique(
            parent_keys, out_capacity, out_table_size)
    else:
        unique_keys, parent_idx, n_out = sort_unique(parent_keys, out_capacity)
    parent_idx = jnp.where(parent_idx < out_capacity, parent_idx, -1)

    corner_xyz = child[:, 1:] - parent_xyz * 2  # each component in {0, 1}
    corner = (corner_xyz[:, 0] * 2 + corner_xyz[:, 1]) * 2 + corner_xyz[:, 2]
    corner = jnp.where(parent_idx >= 0, corner, 0)

    out_grid = grid_from_sorted_keys(unique_keys, out_shape, n_out)
    return DownsampleRulebook(parent_idx=parent_idx, corner=corner, out_grid=out_grid)


def build_down_rule(rb: DownsampleRulebook, child_grid: SparseGrid,
                    child_table: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gather-form rule of the strided conv: (8, V_out) int32 into V_in.

    rule[k][p] = index of the child voxel at ``2 * parent + corner_k`` (or -1).
    Equivalent to the scatter form in :func:`down_conv` but expressed as a
    gather so the banded Pallas kernel applies: for a fixed corner parity the
    child of a lexicographically sorted parent sequence is itself sorted.
    """
    out = rb.out_grid
    corners = kernel_offsets(2) - kernel_offsets(2).min()  # (8, 3) in {0,1}

    def probe(_, corner):
        child_xyz = out.coords[:, 1:] * 2 + corner[None, :]
        child_coords = jnp.concatenate([out.coords[:, :1], child_xyz], axis=1)
        keys = jnp.where(out.live_mask,
                         encode_keys(child_coords, child_grid.spatial_shape),
                         SENTINEL)
        if child_table is not None:
            row = jnp.take(child_table, keys, mode="fill", fill_value=-1)
        else:
            row = lookup(child_grid.keys, keys)
        return None, row

    _, rule = jax.lax.scan(probe, None, corners)
    return rule


def build_inverse_rule(rb: DownsampleRulebook) -> jnp.ndarray:
    """Gather-form rule of the inverse conv: (8, V_in) int32 into V_out.

    rule[k][c] = parent index when child c's corner is k, else -1.  Valid
    entries per corner are monotone (fixed-parity subsequence), so the banded
    kernel applies.
    """
    k_ids = jnp.arange(8, dtype=jnp.int32)[:, None]
    valid = (rb.parent_idx[None, :] >= 0) & (rb.corner[None, :] == k_ids)
    return jnp.where(valid, rb.parent_idx[None, :], -1)


# ---------------------------------------------------------------------------
# Convolution ops (XLA path)
# ---------------------------------------------------------------------------

def subm_conv(feats: jnp.ndarray, weight: jnp.ndarray, rule: jnp.ndarray,
              live_mask: jnp.ndarray, center_identity: bool = True) -> jnp.ndarray:
    """Rulebook conv (XLA path): feats (V, Cin), weight (K, Cin, Cout),
    rule (K, V_out) -> (V_out, Cout).

    A lax.scan over the K kernel offsets: each step is a row gather + one
    large GEMM, which XLA tiles onto the MXU.  Scan (not a python loop) keeps
    the generated code K-independent — the model instantiates this fallback
    inside ~65 lax.cond branches, and unrolled it contributed hundreds of MB
    to the executable.  ``center_identity`` (the submanifold rule's center
    column is the identity) is accepted for API parity but not exploited:
    special-casing the center would split the scan and ~5x the code for a
    ~4% FLOP saving on a rarely-taken fallback path.
    """
    del center_identity
    v = feats.shape[0]
    weight = weight.astype(feats.dtype)

    def body(acc, wr):
        w_j, idx = wr
        gathered = feats[jnp.clip(idx, 0, v - 1)]
        gathered = jnp.where((idx >= 0)[:, None], gathered, 0.0)
        return acc + gathered @ w_j, None

    acc0 = jnp.zeros((rule.shape[1], weight.shape[2]), feats.dtype)
    acc, _ = jax.lax.scan(body, acc0, (weight, rule))
    return jnp.where(live_mask[:, None], acc, 0.0)


def down_conv(feats: jnp.ndarray, weight: jnp.ndarray, rb: DownsampleRulebook) -> jnp.ndarray:
    """Strided conv k=2 s=2: feats (V_in, Cin), weight (8, Cin, Cout) -> (V_out, Cout).

    One wide GEMM (V_in, Cin) @ (Cin, 8*Cout) followed by a per-row corner select
    and a segment scatter-add onto parents; trades 8x FLOPs for full MXU tiles,
    which wins on TPU for the small channel counts here.
    """
    cin, cout = weight.shape[1], weight.shape[2]
    weight = weight.astype(feats.dtype)
    wide = feats @ weight.transpose(1, 0, 2).reshape(cin, 8 * cout)
    wide = wide.reshape(-1, 8, cout)
    # corner select as a masked sum (scanned): vectorizes cleanly on the VPU
    # where an 8-way take_along gather lowers badly
    def pick(acc, k):
        return acc + jnp.where((rb.corner == k)[:, None], wide[:, k, :], 0.0), None
    contrib, _ = jax.lax.scan(pick, jnp.zeros((wide.shape[0], cout), feats.dtype),
                              jnp.arange(8))
    out_cap = rb.out_grid.capacity
    target = jnp.where(rb.parent_idx >= 0, rb.parent_idx, out_cap)
    out = jnp.zeros((out_cap, cout), feats.dtype).at[target].add(contrib, mode="drop")
    return out


def inverse_conv(coarse_feats: jnp.ndarray, weight: jnp.ndarray,
                 rb: DownsampleRulebook, fine_live_mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse conv k=2 (SparseInverseConv3d parity): restores the pre-downsample
    active set via the transposed rulebook.  coarse (V_out, Cin) -> fine (V_in, Cout).

    Fine voxels that were dropped by the strided conv (no parent) get zeros,
    matching spconv's behavior for sites outside every kernel window.
    """
    cin, cout = weight.shape[1], weight.shape[2]
    weight = weight.astype(coarse_feats.dtype)
    v_out = coarse_feats.shape[0]
    parent = jnp.clip(rb.parent_idx, 0, v_out - 1)
    gathered = coarse_feats[parent]
    gathered = jnp.where((rb.parent_idx >= 0)[:, None], gathered, 0.0)
    wide = gathered @ weight.transpose(1, 0, 2).reshape(cin, 8 * cout)
    wide = wide.reshape(-1, 8, cout)
    def pick(acc, k):
        return acc + jnp.where((rb.corner == k)[:, None], wide[:, k, :], 0.0), None
    out, _ = jax.lax.scan(pick, jnp.zeros((wide.shape[0], cout),
                                          coarse_feats.dtype), jnp.arange(8))
    return jnp.where(fine_live_mask[:, None], out, 0.0)
