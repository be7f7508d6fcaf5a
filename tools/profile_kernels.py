"""Scan-amortized kernel microbenchmarks: per-op device time without the
~9 ms/dispatch tunnel overhead (each op is iterated R times inside ONE jit
via lax.scan with data dependence, so XLA cannot elide repeats).

Usage: python tools/profile_kernels.py [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--capacity", type=int, default=1 << 19)
    args = ap.parse_args()
    R = args.reps

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}", flush=True)

    from treelearn_tpu.data.synthetic import make_synthetic_forest
    from treelearn_tpu.model.network import default_capacities
    from treelearn_tpu.model.blocks import build_level_plans
    from treelearn_tpu.ops.sparse import (
        build_dense_table, build_downsample, build_subm_rulebook,
        grid_from_sorted_keys, subm_conv)
    from treelearn_tpu.ops.voxelize import voxelize_points

    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    pts = data[:, :3].astype(np.float32)
    pts -= pts.min(axis=0)
    n_pad = 1 << 20
    coords = np.zeros((n_pad, 3), np.float32)
    coords[: len(pts)] = pts[:n_pad]
    feats = np.zeros((n_pad, 1), np.float32)
    batch_ids = np.zeros(n_pad, np.int32)
    valid = np.zeros(n_pad, bool)
    valid[: min(len(pts), n_pad)] = True

    span = pts.max(axis=0)
    sshape = tuple(int(np.ceil(s / 0.1 / 64) + 1) * 64 for s in span)
    cap = args.capacity
    sshape_j = jnp.asarray(sshape, jnp.int32)
    print(f"spatial_shape={sshape} capacity={cap}")

    def bench(name, fn, *xs, reps=R):
        """fn must map its first arg to a same-shaped output (data dep)."""
        def loop(x0, rest):
            def body(x, _):
                return fn(x, *rest), 0
            y, _ = jax.lax.scan(body, x0, None, length=reps)
            return y
        j = jax.jit(loop)
        out = j(xs[0], xs[1:])
        jax.block_until_ready(out)
        t0 = time.time()
        out = j(xs[0], xs[1:])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"  {name:<44} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    # Build a realistic level-0 grid once
    @jax.jit
    def mk():
        vb = voxelize_points(jnp.asarray(coords), jnp.asarray(feats),
                             jnp.asarray(batch_ids), jnp.asarray(valid),
                             batch_size=1, voxel_size=0.1, capacity=cap,
                             max_pts=3, spatial_shape=sshape_j,
                             use_coords=False, use_feats=False)
        return vb.voxel_keys, vb.n_voxels, vb.voxel_feats, vb.v2p_map

    keys, n_vox, vfeats, v2p = mk()
    print(f"L0 active voxels: {int(n_vox)}")
    grid0 = grid_from_sorted_keys(keys, sshape_j, n_vox)
    table_size = int(np.prod(sshape))

    print("\n-- plan-build components (level 0) --")
    # voxelize: key-perturbing data dep via adding (x % 1) == 0 noop
    bench("voxelize_points (1M pts)",
          lambda c: c + voxelize_points(
              c, jnp.asarray(feats), jnp.asarray(batch_ids),
              jnp.asarray(valid), batch_size=1, voxel_size=0.1, capacity=cap,
              max_pts=3, spatial_shape=sshape_j, use_coords=False,
              use_feats=False).voxel_feats[0, 0] * 0,
          jnp.asarray(coords), reps=3)

    def dep_keys(x):  # int32 keys -> same keys (forces recompute)
        return x

    bench("build_dense_table (126.9M table)",
          lambda k: jnp.where(
              build_dense_table(grid0._replace(keys=k), table_size)[
                  :cap] >= -2, k, k),
          keys, reps=3)

    table = jax.jit(lambda: build_dense_table(grid0, table_size))()
    bench("subm rulebook probes (27 offs, table)",
          lambda k, t: build_subm_rulebook(
              grid0._replace(keys=k), 3, dense_table=t)[0] * 0 + k,
          keys, table, reps=3)
    bench("subm rulebook probes (searchsorted)",
          lambda k: build_subm_rulebook(grid0._replace(keys=k), 3)[0] * 0 + k,
          keys, reps=3)
    half_table = int(np.prod([s // 2 for s in sshape]))
    bench("build_downsample (table_unique)",
          lambda k: build_downsample(
              grid0._replace(keys=k), cap // 2,
              out_table_size=half_table).parent_idx * 0 + k, keys, reps=3)
    bench("build_downsample (sort_unique)",
          lambda k: build_downsample(
              grid0._replace(keys=k), cap // 2).parent_idx * 0 + k,
          keys, reps=3)

    from treelearn_tpu.ops.pallas_conv import rule_spans
    rule = jax.jit(lambda: build_subm_rulebook(grid0, 3, dense_table=table))()
    bench("rule_spans (27, V)",
          lambda r: jnp.where(rule_spans(r, 128, 512, cap).ok, r, r),
          rule, reps=5)

    print("\n-- full plan build (all 7 levels) --")
    def plans_fn(k):
        g = grid_from_sorted_keys(k, sshape_j, n_vox)
        plans = build_level_plans(g, 7, 3, default_capacities(cap, 7),
                                  static_spatial_shape=sshape, batch_size=1)
        acc = k
        for p in plans:
            acc = acc + p.subm_rule[0, 0]
        return acc
    bench("build_level_plans (depth 7)", plans_fn, keys, reps=3)

    print("\n-- conv path (level 0 shapes) --")
    from treelearn_tpu.ops.pallas_conv import subm_conv_banded
    rng = np.random.default_rng(0)
    live = keys != np.iinfo(np.int32).max
    for c in (32, 64):
        v = cap if c == 32 else cap // 2
        r = rule[:, :v] if c == 32 else jax.jit(
            lambda: build_subm_rulebook(
                grid_from_sorted_keys(keys[:v], sshape_j, jnp.minimum(
                    n_vox, v)), 3))()
        x = jnp.asarray(rng.standard_normal((v, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.float32)
        lv = live[:v]
        useful = min(int(n_vox), v) * 27 * c * c * 2
        dt = bench(f"banded subm conv V={v} C={c}",
                   lambda x_, r_, w_: subm_conv_banded(
                       x_, w_, r_, lv) * 1e-3 + x_ * 0,
                   x, r, w, reps=5)
        print(f"    -> {useful / dt / 98.5e12 * 100:5.1f}% MFU "
              f"({useful / 1e9:.1f} GFLOP)")
        dt = bench(f"XLA gather subm conv V={v} C={c}",
                   lambda x_, r_, w_: subm_conv(
                       x_, w_, r_, lv) * 1e-3 + x_ * 0,
                   x, r, w, reps=5)
        print(f"    -> {useful / dt / 98.5e12 * 100:5.1f}% MFU")

    print("\n-- elementwise / gather costs --")
    x32 = jnp.asarray(rng.standard_normal((cap, 32)), jnp.float32)
    bench("BN+ReLU (V, 32) f32", lambda x: jax.nn.relu(
        (x - x.mean(0)) * jax.lax.rsqrt(x.var(0) + 1e-4)), x32, reps=10)
    bench("devoxelize gather (1M pts from V, 32)",
          lambda x: x * 0 + jnp.take(x, jnp.asarray(v2p) % cap, axis=0)[
              :cap], x32, reps=3)


if __name__ == "__main__":
    main()
