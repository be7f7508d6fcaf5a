"""Model-step profiler: splits forward time into voxelize / rulebook-build /
U-Net / heads on the real device, plus per-level conv-kernel microbenchmarks.

Usage:  python tools/profile_model.py [--points N] [--capacity C] [--levels L]

Times separately-jitted prefixes of the forward (voxelize; voxelize+plans;
full) so differences attribute time to each stage, then microbenches the
banded Pallas conv at each level's (V, C) to find where the MFU goes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=5, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=968000)
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-model", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}", flush=True)

    from treelearn_tpu.data.synthetic import make_synthetic_forest
    from treelearn_tpu.model.network import TreeLearn, analytic_model_flops
    from treelearn_tpu.ops.voxelize import voxelize_points
    from treelearn_tpu.ops.sparse import grid_from_sorted_keys
    from treelearn_tpu.model.blocks import build_level_plans
    from treelearn_tpu.model.network import default_capacities

    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    pts = data[: args.points, :3].astype(np.float32)
    pts -= pts.min(axis=0)
    n_pad = 1 << int(np.ceil(np.log2(len(pts))))
    coords = np.zeros((n_pad, 3), np.float32)
    coords[: len(pts)] = pts
    feats = np.zeros((n_pad, 1), np.float32)
    batch_ids = np.zeros(n_pad, np.int32)
    valid = np.zeros(n_pad, bool)
    valid[: len(pts)] = True

    span = pts.max(axis=0)
    sshape = tuple(int(np.ceil(s / 0.1 / 64) + 1) * 64 for s in span)
    print(f"points={len(pts)} padded={n_pad} spatial_shape={sshape}")

    model = TreeLearn(spatial_shape=sshape, num_blocks=args.levels)
    params, state = model.init(0)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    jc = {k: jax.device_put(v, dev) for k, v in
          dict(coords=coords, input_feats=feats, batch_ids=batch_ids,
               valid=valid).items()}

    cap = args.capacity
    sshape_j = jnp.asarray(sshape, jnp.int32)

    @jax.jit
    def stage_vox(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=cap, max_pts=3, spatial_shape=sshape_j,
                             use_coords=False, use_feats=False)
        return vb.voxel_feats, vb.n_voxels

    @jax.jit
    def stage_plans(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=cap, max_pts=3, spatial_shape=sshape_j,
                             use_coords=False, use_feats=False)
        grid0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        plans = build_level_plans(grid0, args.levels, 3,
                                  default_capacities(cap, args.levels),
                                  static_spatial_shape=sshape, batch_size=1)
        leaves = jax.tree_util.tree_leaves(
            [(p.subm_rule, p.grid.keys) for p in plans])
        return [l.sum() for l in leaves], jnp.stack(
            [p.grid.n_active for p in plans])

    t_vox = timed(stage_vox, *jc.values(), n=args.reps)
    print(f"voxelize:           {t_vox * 1e3:8.1f} ms")
    out = stage_plans(*jc.values())
    n_vox_levels = np.asarray(out[1])
    print(f"active voxels/level: {n_vox_levels.tolist()}")
    t_plans = timed(stage_plans, *jc.values(), n=args.reps)
    print(f"voxelize+plans:     {t_plans * 1e3:8.1f} ms  "
          f"(plans ~{(t_plans - t_vox) * 1e3:.1f} ms)")

    if not args.skip_model:
        fwd = model.make_forward(batch_size=1, voxel_capacity=cap)
        t0 = time.time()
        out, _ = fwd(params, state, *jc.values())
        jax.block_until_ready(out["semantic_prediction_logits"])
        print(f"full fwd compile+run: {time.time() - t0:.1f} s")
        t_full = timed(lambda *a: fwd(params, state, *a)[0][
            "semantic_prediction_logits"], *jc.values(), n=args.reps)
        flops = analytic_model_flops(n_vox_levels, n_pad,
                                     num_blocks=args.levels)
        print(f"full forward:       {t_full * 1e3:8.1f} ms  "
              f"(unet+heads ~{(t_full - t_plans) * 1e3:.1f} ms, "
              f"MFU {flops / t_full / 98.5e12 * 100:.1f}%)")

    # --- conv microbench per level ------------------------------------------
    from treelearn_tpu.ops.pallas_conv import (
        DEFAULT_TILE, DEFAULT_WINDOW, rule_spans, subm_conv_banded)
    from treelearn_tpu.ops.sparse import subm_conv

    print("\nper-level submanifold conv microbench "
          "(banded Pallas vs XLA gather):")
    rng = np.random.default_rng(0)

    @jax.jit
    def make_level(c, f, b, v):
        vb = voxelize_points(c, f, b, v, batch_size=1, voxel_size=0.1,
                             capacity=cap, max_pts=3, spatial_shape=sshape_j,
                             use_coords=False, use_feats=False)
        grid0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        plans = build_level_plans(grid0, args.levels, 3,
                                  default_capacities(cap, args.levels),
                                  static_spatial_shape=sshape, batch_size=1)
        return [(p.subm_rule, p.grid.keys, p.grid.n_active) for p in plans]

    level_data = make_level(*jc.values())
    for lvl, (rule, keys, n_active) in enumerate(level_data):
        c = 32 * (lvl + 1)
        v = rule.shape[1]
        x = jnp.asarray(rng.standard_normal((v, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.float32)
        live = keys != np.iinfo(np.int32).max
        sp = jax.jit(rule_spans, static_argnums=(1, 2, 3))(
            rule, DEFAULT_TILE, DEFAULT_WINDOW, v)
        if not bool(sp.ok):
            print(f"  L{lvl}: spans NOT ok — banded path would fall back")
        t_banded = timed(
            lambda x_: subm_conv_banded(x_, w, rule, live), x, n=args.reps)
        t_xla = timed(jax.jit(
            lambda x_: subm_conv(x_, w, rule, live)), x, n=args.reps)
        useful = int(n_active) * 27 * c * c * 2
        print(f"  L{lvl}: V={v} n={int(n_active)} C={c}  "
              f"banded {t_banded * 1e3:7.2f} ms ({useful / t_banded / 98.5e12 * 100:5.1f}% MFU)  "
              f"xla {t_xla * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
