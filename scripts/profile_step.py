"""Attribute the model eval-step device time on real TPU hardware.

Times separately-jitted sub-programs of the flagship forward on a
whole-plot-sized input (the bench shape: V=512k capacity, ~437k active):

  1. voxelize_points alone
  2. voxelize + build_level_plans (rulebook construction)
  3. full forward (the bench's model line)
  4. full forward minus plans = U-Net conv time (by subtraction)
  5. microbenches: argsort, dense-table probe gather, searchsorted

Usage:  python scripts/profile_step.py [n_points]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.model import TreeLearn
from treelearn_tpu.model.blocks import build_level_plans
from treelearn_tpu.model.network import default_capacities
from treelearn_tpu.ops.sparse import grid_from_sorted_keys
from treelearn_tpu.ops.voxelize import voxelize_points

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_RTT = [0.0]


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.float32(0)
    for l in leaves:
        acc = acc + jnp.sum(l).astype(jnp.float32)
    return acc


def timeit(fn, *argsets, reps=3):
    """argsets: list of distinct input tuples (identical re-dispatches are
    deduped by the tunnel server, so every rep must use fresh inputs).
    Forces a scalar D2H per rep; subtracts the measured tunnel RTT."""
    wrapped = jax.jit(lambda *a: _scalarize(fn(*a)))
    float(wrapped(*argsets[0]))  # compile
    ts = []
    for i in range(reps):
        args = argsets[i % len(argsets)]
        t0 = time.perf_counter()
        float(wrapped(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _RTT[0], 0.0), None


def measure_rtt():
    tiny = [(jnp.asarray(np.float32(i)),) for i in range(4)]
    f = jax.jit(lambda x: x + 1)
    float(f(*tiny[0]))
    ts = []
    for a in tiny:
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    _RTT[0] = min(ts)
    print(f"tunnel RTT baseline:  {_RTT[0]*1e3:8.1f} ms (subtracted below)")


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 437740
    capacity = 1 << 19
    spatial_shape = (640, 640, 192)

    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=9000,
                                    ground_points=968000 - 48 * 9000, seed=3)
    # voxelize on host at 0.1 m like the pipeline, take voxel centers
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.min(0)
    keys = np.unique(
        (np.floor(xyz / 0.1).astype(np.int64) @
         np.array([640 * 192, 192, 1], np.int64)))
    rng = np.random.default_rng(0)
    if len(keys) > n_target:
        keys = rng.choice(keys, n_target, replace=False)
    k0 = np.sort(keys)
    vx = np.stack([k0 // (640 * 192), (k0 // 192) % 640, k0 % 192], 1)
    pts = (vx.astype(np.float32) + 0.5) * 0.1
    n = len(pts)
    print(f"active voxel-points: {n}")

    N = capacity
    coords = np.zeros((N, 3), np.float32)
    coords[:n] = pts
    valid = np.zeros(N, bool)
    valid[:n] = True
    batch_ids = np.zeros(N, np.int32)
    feats = np.ones((N, 1), np.float32)

    # distinct input variants per rep (identical dispatches get deduped)
    variants = []
    for i in range(3):
        c = coords.copy()
        c[:n] += np.float32(0.001 * i)   # same voxel occupancy pattern shift
        variants.append((jnp.asarray(c), jnp.asarray(feats),
                         jnp.asarray(batch_ids), jnp.asarray(valid)))
    jc, jf, jb, jv = variants[0]

    model = TreeLearn(channels=32, num_blocks=7, spatial_shape=list(spatial_shape),
                      use_coords=False, use_feats=False)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)

    caps = default_capacities(capacity, model.num_blocks)

    @jax.jit
    def vox_only(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=capacity, max_pts=3,
                             spatial_shape=np.asarray(spatial_shape, np.int32),
                             use_coords=False, use_feats=False)
        return vb.voxel_keys, vb.n_voxels, vb.v2p_map, vb.voxel_feats

    @jax.jit
    def vox_plans(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=capacity, max_pts=3,
                             spatial_shape=np.asarray(spatial_shape, np.int32),
                             use_coords=False, use_feats=False)
        grid0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        plans = build_level_plans(grid0, model.num_blocks, 3, caps,
                                  static_spatial_shape=spatial_shape,
                                  batch_size=1)
        leaves = []
        for p in plans:
            leaves.append(jnp.sum(p.subm_rule))
            leaves.append(p.grid.n_active)
            if p.subm_spans is not None:
                leaves.append(jnp.sum(p.subm_spans.rd))
                leaves.append(p.subm_spans.ok)
        return tuple(leaves)

    fwd = model.make_forward(batch_size=1, voxel_capacity=capacity,
                             compute_dtype=jnp.bfloat16)

    measure_rtt()

    t_vox, _ = timeit(vox_only, *variants)
    print(f"voxelize only:        {t_vox*1e3:8.1f} ms")

    t_plans, _ = timeit(vox_plans, *variants)
    print(f"voxelize + plans:     {t_plans*1e3:8.1f} ms   (plans ~ {(t_plans-t_vox)*1e3:.1f} ms)")

    @jax.jit
    def vox_plans_rdfree(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=capacity, max_pts=3,
                             spatial_shape=np.asarray(spatial_shape, np.int32),
                             use_coords=False, use_feats=False)
        grid0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        plans = build_level_plans(grid0, model.num_blocks, 3, caps,
                                  static_spatial_shape=spatial_shape,
                                  batch_size=1, rule_free=True)
        leaves = []
        for p in plans:
            leaves.append(p.grid.n_active)
            if p.subm_spans is not None:
                leaves.append(jnp.sum(p.subm_spans.rd))
                leaves.append(p.subm_spans.ok)
        return tuple(leaves)

    t_rdp, _ = timeit(vox_plans_rdfree, *variants)
    print(f"voxelize + rd plans:  {t_rdp*1e3:8.1f} ms   (rd plans ~ {(t_rdp-t_vox)*1e3:.1f} ms)")

    fullsets = [(params, state) + v for v in variants]
    t_full, out = timeit(lambda p_, s_, *a: fwd(p_, s_, *a)[0]["semantic_prediction_logits"],
                         *fullsets)
    print(f"full forward:         {t_full*1e3:8.1f} ms   (unet+heads ~ {(t_full-t_plans)*1e3:.1f} ms)")

    # --- microbenches -------------------------------------------------------
    ksets = []
    for i in range(3):
        keys_pad = np.full(capacity, np.iinfo(np.int32).max, np.int32)
        kk = k0.astype(np.int32).copy()
        if i:
            kk = kk[i:]  # drop a few rows: distinct content, same shape-ish
            kk = np.concatenate([kk, kk[-1:] + np.arange(1, i + 1, dtype=np.int32)])
        keys_pad[:n] = kk
        ksets.append((jnp.asarray(keys_pad),))
    jk = ksets[0][0]

    t, _ = timeit(lambda k: jnp.argsort(k), *ksets)
    print(f"argsort 512k int32:   {t*1e3:8.1f} ms")

    table_size = 640 * 640 * 192
    @jax.jit
    def build_probe(k):
        table = jnp.full((table_size,), -1, jnp.int32).at[k].set(
            jnp.arange(capacity, dtype=jnp.int32), mode="drop")
        def probe(_, delta):
            q = jnp.where(k != np.iinfo(np.int32).max, k + delta, -1)
            return None, jnp.take(table, q, mode="fill", fill_value=-1)
        _, rule = jax.lax.scan(probe, None,
                               jnp.arange(-13, 14, dtype=jnp.int32))
        return rule.sum()

    t, _ = timeit(build_probe, *ksets)
    print(f"table + 27 probes:    {t*1e3:8.1f} ms   (one L0-level rulebook)")

    @jax.jit
    def table_only(k):
        return jnp.full((table_size,), -1, jnp.int32).at[k].set(
            jnp.arange(capacity, dtype=jnp.int32), mode="drop").sum()

    t, _ = timeit(table_only, *ksets)
    print(f"dense table build:    {t*1e3:8.1f} ms")

    @jax.jit
    def ss(k):
        def probe(_, delta):
            q = jnp.where(k != np.iinfo(np.int32).max, k + delta, -1)
            return None, jnp.searchsorted(k, q).astype(jnp.int32)
        _, rule = jax.lax.scan(probe, None, jnp.arange(-4, 5, dtype=jnp.int32))
        return rule.sum()

    t, _ = timeit(ss, *ksets)
    print(f"9x searchsorted 512k: {t*1e3:8.1f} ms")

    # boundary-only searchsorted (what the in-kernel join needs)
    tile = 128
    nb = capacity // tile
    @jax.jit
    def ss_bounds(k):
        bounds = k[::tile]
        def probe(_, delta):
            q = jnp.where(bounds != np.iinfo(np.int32).max, bounds + delta, -1)
            return None, jnp.searchsorted(k, q).astype(jnp.int32)
        _, lo = jax.lax.scan(probe, None, jnp.arange(-4, 5, dtype=jnp.int32))
        return lo.sum()

    t, _ = timeit(ss_bounds, *ksets)
    print(f"9x searchsorted {nb} tile-bounds: {t*1e3:8.1f} ms")

    # devoxelize-style row gather
    feats32 = jnp.asarray(rng.normal(size=(capacity, 32)).astype(np.float32))
    gsets = [(feats32, jnp.asarray(rng.integers(0, n, capacity).astype(np.int32)))
             for _ in range(3)]
    t, _ = timeit(lambda f, i: f[i].sum(), *gsets)
    print(f"row gather (512k,32): {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
