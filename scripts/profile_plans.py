"""Decompose the vox+plans cost of the eval step (chained in-program timing).

Components at the bench whole-plot shape (437k voxels, cap 2^19, depth 7):
  vox        — voxelize_points (sort-based pooling)
  grid       — grid_from_sorted_keys
  spans      — 7x build_spans_banded (rd kernel + 2 searchsorted/level)
  downs      — 6x build_downsample
  ss_sort    — the searchsorted(method='sort') calls alone, per level
  all        — the full build_level_plans

Usage: python scripts/profile_plans.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.model.blocks import build_level_plans, level_tile_window
from treelearn_tpu.model.network import default_capacities
from treelearn_tpu.ops.sparse import grid_from_sorted_keys, build_downsample
from treelearn_tpu.ops.pallas_rd import build_spans_banded
from treelearn_tpu.ops.voxelize import (voxel_downsample_trace_np,
                                        voxelize_points)

SS = (640, 640, 192)
CAP = 1 << 19
CHAIN = 8


def chained(label, fn, args_list):
    """fn(a) -> pytree; run CHAIN times inside one jit with a scalar feedback
    so iterations can't be deduped; report (total-RTT)/CHAIN."""

    @jax.jit
    def run(a, args):
        def body(i, acc):
            out = fn(*args, jitter=acc * 1e-6 + i)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return acc + s * 1e-20
        return jax.lax.fori_loop(0, CHAIN, body, a)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)

    float(run(jnp.float32(0), args_list[0]))  # compile
    best = 1e9
    for i in range(4):
        t0 = time.perf_counter()
        float(run(jnp.float32(i), args_list[i % len(args_list)]))
        best = min(best, time.perf_counter() - t0)
    per = max(best - rtt, 0) / CHAIN
    print(f"{label:34s} {per*1e3:8.2f} ms")
    return per


def main():
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.mean(0)
    vox_pts, _, _ = voxel_downsample_trace_np(xyz, 0.1)
    n = len(vox_pts)
    print(f"{n} voxels, cap {CAP}")
    pad = np.zeros((CAP, 3), np.float32)
    pad[:n] = vox_pts
    coords = jnp.asarray(pad)
    feats = jnp.ones((CAP, 1), jnp.float32)
    bids = jnp.zeros((CAP,), jnp.int32)
    valid = jnp.asarray(np.arange(CAP) < n)
    ssnp = np.asarray(SS, np.int32)

    def vox(coords, jitter=0.0):
        return voxelize_points(coords + jitter * 1e-4, feats, bids, valid,
                               batch_size=1, voxel_size=0.1, capacity=CAP,
                               max_pts=3, spatial_shape=ssnp,
                               use_coords=False, use_feats=False)

    chained("voxelize_points", vox, [(coords,)])

    vb = jax.jit(lambda c: vox(c))(coords)
    keys0 = vb.voxel_keys
    nvox = vb.n_voxels

    def grid_fn(keys, jitter=0.0):
        g = grid_from_sorted_keys(keys, vb.spatial_shape, nvox)
        return (g.keys, g.live_mask)

    chained("grid_from_sorted_keys", grid_fn, [(keys0,)])

    g0 = jax.jit(lambda k: grid_from_sorted_keys(k, vb.spatial_shape, nvox))(keys0)

    caps = default_capacities(CAP, 7)

    def spans_l0(keys, jitter=0.0):
        tile, window = level_tile_window(32, CAP)
        sp = build_spans_banded(keys, spatial_shape=SS, capacity=CAP,
                                tile=tile, window=window)
        return (sp.lo, sp.rd[:, :256], sp.ok)

    chained("build_spans_banded L0", spans_l0, [(keys0,)])

    def ss_only(keys, jitter=0.0):
        # the two searchsorted calls of build_spans_banded L0
        tile, window = level_tile_window(32, CAP)
        ntiles = CAP // tile
        tk = keys.reshape(ntiles, tile)
        from treelearn_tpu.ops.hashing import SENTINEL
        live_row = tk != SENTINEL
        kmin = jnp.min(jnp.where(live_row, tk, np.iinfo(np.int32).max), axis=1)
        kmax = jnp.max(jnp.where(live_row, tk, np.iinfo(np.int32).min), axis=1)
        from treelearn_tpu.ops.pallas_rd import band_deltas
        dlt = jnp.asarray([d for _, _, d in band_deltas(SS)], jnp.int32)[:, None]
        lo = jnp.searchsorted(keys, kmin[None, :] + dlt - 1, side="left",
                              method="sort").astype(jnp.int32)
        hi = jnp.searchsorted(keys, kmax[None, :] + dlt + 1, side="right",
                              method="sort").astype(jnp.int32)
        return lo + hi

    chained("L0 searchsorted x2 (sort)", ss_only, [(keys0,)])

    def downs_l0(keys, jitter=0.0):
        g = grid_from_sorted_keys(keys, vb.spatial_shape, nvox)
        half = (SS[0] // 2) * (SS[1] // 2) * (SS[2] // 2)
        rb = build_downsample(g, int(caps[1]), out_table_size=half)
        return (rb.out_grid.keys, rb.parent_idx)

    chained("build_downsample L0", downs_l0, [(keys0,)])

    def plans_all(keys, jitter=0.0):
        g = grid_from_sorted_keys(keys, vb.spatial_shape, nvox)
        plans = build_level_plans(g, 7, 3, caps, static_spatial_shape=SS,
                                  batch_size=1, rule_free=True)
        out = []
        for p in plans:
            out.append(p.grid.n_active)
            out.append(p.subm_spans.lo)
        return tuple(out)

    chained("build_level_plans (7 lvl)", plans_all, [(keys0,)])


if __name__ == "__main__":
    main()
