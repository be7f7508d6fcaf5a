"""Ablation profile of the model eval step on the bench workload.

Times, on the real chip, each successive slice of the jit program the
whole-plot pipeline runs — voxelize, + level plans (rulebooks), + U-Net —
to locate where the model's device time actually goes.

Usage: python tools/profile_step.py
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
from treelearn_tpu.model.network import TreeLearn, default_capacities
from treelearn_tpu.model.blocks import build_level_plans
from treelearn_tpu.ops.sparse import grid_from_sorted_keys
from treelearn_tpu.ops.voxelize import voxelize_points


def timeit(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    # the bench forest, voxelized the way the whole-plot path does
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    pts = data[:, :3] - data[:, :3].mean(0)
    vs = 0.1
    vox = np.unique(np.floor((pts - pts.min(0)) / vs).astype(np.int32), axis=0)
    vox_pts = (vox + 0.5) * vs + pts.min(0)
    n_vox = len(vox_pts)
    capacity = 1 << int(np.ceil(np.log2(n_vox)))
    ext = vox_pts.max(0) - vox_pts.min(0)
    ss = tuple(int(np.ceil((np.ceil(e / vs) + 2) / 64)) * 64 for e in ext)
    print(f"voxels={n_vox} capacity={capacity} spatial_shape={ss}")

    n_pad = capacity
    coords = np.zeros((n_pad, 3), np.float32)
    coords[:n_vox] = vox_pts - vox_pts.min(0)
    feats = np.zeros((n_pad, 1), np.float32)
    valid = np.zeros((n_pad,), bool)
    valid[:n_vox] = True
    batch_ids = np.zeros((n_pad,), np.int32)
    coords, feats = jnp.asarray(coords), jnp.asarray(feats)
    batch_ids, valid = jnp.asarray(batch_ids), jnp.asarray(valid)

    model = TreeLearn(channels=32, num_blocks=7, spatial_shape=list(ss),
                      voxel_size=vs)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)
    caps = default_capacities(capacity, model.num_blocks)
    sshape = jnp.asarray(ss, jnp.int32)

    @jax.jit
    def stage_vox(coords, feats, batch_ids, valid):
        return voxelize_points(coords, feats, batch_ids, valid, batch_size=1,
                               voxel_size=vs, capacity=capacity, max_pts=3,
                               spatial_shape=sshape, use_coords=False,
                               use_feats=False)

    @jax.jit
    def stage_plans(coords, feats, batch_ids, valid):
        vb = voxelize_points(coords, feats, batch_ids, valid, batch_size=1,
                             voxel_size=vs, capacity=capacity, max_pts=3,
                             spatial_shape=sshape, use_coords=False,
                             use_feats=False)
        g0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        plans = build_level_plans(g0, model.num_blocks, 3, caps,
                                  static_spatial_shape=ss, batch_size=1)
        return [(p.subm_rule, p.grid.n_active) for p in plans]

    import sys
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    fwd = model.make_forward(batch_size=1, voxel_capacity=capacity,
                             compute_dtype=dtype)

    t_vox, _ = timeit(stage_vox, coords, feats, batch_ids, valid)
    print(f"voxelize            : {t_vox * 1e3:8.1f} ms", flush=True)
    t_plans, plan_out = timeit(stage_plans, coords, feats, batch_ids, valid)
    per_level = [int(n) for _, n in plan_out]
    print(f"n_voxels_per_level = {per_level}")
    print(f"voxelize + plans    : {t_plans * 1e3:8.1f} ms"
          f"   (plans alone ~{(t_plans - t_vox) * 1e3:.1f} ms)", flush=True)
    t_full, out = timeit(fwd, params, state, coords, feats, batch_ids, valid,
                         iters=5)
    print(f"full forward ({dtype.__name__}): {t_full * 1e3:8.1f} ms"
          f"   (unet+heads alone ~{(t_full - t_plans) * 1e3:.1f} ms)")
    if out[0].get("spans_ok") is not None:
        print(f"spans_ok = {np.asarray(out[0]['spans_ok'])}")


if __name__ == "__main__":
    main()
