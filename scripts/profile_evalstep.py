"""Decompose the bench's model step: bare forward vs eval step (compaction,
packing, heads) at the whole-plot bench shape.

The bench's model line times make_eval_step's pure re-dispatch; profile_step
times the bare forward.  Round-2 showed 1.00 s vs 0.25 s for nominally the
same work — this script isolates where the difference lives by timing, at the
exact bench shape (968k-point synthetic forest, whole-plot mode):

  A. bare forward (model.apply, bf16)
  B. eval step WITHOUT inner compaction (inner_capacity=None)
  C. full eval step (compaction + f16 packing) — the bench's number

Usage: python scripts/profile_evalstep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.model import TreeLearn
from treelearn_tpu.ops.voxelize import voxel_downsample_trace_np as voxel_downsample_trace
from treelearn_tpu.pipeline.streaming import TileStream
from treelearn_tpu.train.loop import make_eval_step

_RTT = [0.0]


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
    print(f"tunnel RTT baseline: {_RTT[0]*1e3:.1f} ms")


def timeit(label, fn, argsets, reps=4):
    wrapped = jax.jit(lambda *a: sum(jnp.sum(l).astype(jnp.float32)
                                     for l in jax.tree_util.tree_leaves(fn(*a))))
    t0 = time.perf_counter()
    float(wrapped(*argsets[0]))
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        float(wrapped(*argsets[i % len(argsets)]))
        ts.append(time.perf_counter() - t0)
    best = max(min(ts) - _RTT[0], 0)
    print(f"{label:38s} {best*1e3:8.1f} ms   (compile+first {compile_s:.1f}s)")
    return best


def main():
    # the bench forest (bench.py defaults)
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.mean(0)
    vox_pts, _, _ = voxel_downsample_trace(xyz, 0.1)
    vox_pts = vox_pts.astype(np.float32)
    print(f"bench plot: {len(xyz)} pts -> {len(vox_pts)} voxels")

    stream = TileStream(vox_pts, np.zeros(len(vox_pts), np.int64),
                        np.zeros((len(vox_pts), 1), np.float32), 8.0, 13.5, 0.5)

    def _pow2(x):
        return 1 << int(np.ceil(np.log2(max(int(x), 1))))

    ext = vox_pts.max(axis=0) - vox_pts.min(axis=0)
    ss = [int(np.ceil((np.ceil(e / 0.1) + 2) / 64)) * 64 for e in ext]
    cap = _pow2(len(vox_pts))
    print(f"spatial_shape {ss}, capacity {cap}")
    batch = next(iter(stream.whole_plot_batches(min_bucket=cap)))
    n = batch["coords"].shape[0]
    inner_cap = _pow2(int((batch["masks_inner"] & batch["valid"]).sum()))
    inner_cap = min(inner_cap, n)
    print(f"batch rows {n}, inner_cap {inner_cap}")

    model = TreeLearn(channels=32, num_blocks=7, spatial_shape=ss,
                      use_coords=False, use_feats=False)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)

    variants = []
    for i in range(3):
        b = {k: np.asarray(batch[k]) for k in
             ("coords", "input_feats", "batch_ids", "valid", "masks_inner")}
        b["coords"] = b["coords"].copy()
        b["coords"][b["valid"]] += np.float32(0.0007 * i)
        variants.append({k: jax.device_put(v) for k, v in b.items()})

    measure_rtt()

    # A. bare forward
    def bare(p, s, b):
        out, _ = model.apply(p, s, b["coords"], b["input_feats"],
                             b["batch_ids"], b["valid"], batch_size=1,
                             voxel_capacity=cap, training=False,
                             compute_dtype=jnp.bfloat16)
        return out["semantic_prediction_logits"]

    timeit("A bare forward", bare, [(params, state, v) for v in variants])

    # B. eval step, no compaction
    step_b = make_eval_step(model, batch_size=1, voxel_capacity=cap,
                            compute_dtype=jnp.bfloat16, inner_capacity=None,
                            need_backbone=False)
    timeit("B eval step (no compaction)", step_b,
           [(params, state, v) for v in variants])

    # C. full eval step (the bench's)
    step_c = make_eval_step(model, batch_size=1, voxel_capacity=cap,
                            compute_dtype=jnp.bfloat16,
                            inner_capacity=inner_cap, need_backbone=False)
    timeit("C eval step (compaction+packing)", step_c.packed,
           [(params, state, v) for v in variants])

    if os.environ.get("TL_SWEEP_LEVELS"):
        from treelearn_tpu.model.blocks import build_level_plans
        from treelearn_tpu.model.network import default_capacities
        from treelearn_tpu.ops.sparse import grid_from_sorted_keys
        from treelearn_tpu.ops.voxelize import voxelize_points

        def vox_plans(p_, s_, b):
            vb = voxelize_points(b["coords"], b["input_feats"],
                                 b["batch_ids"], b["valid"], batch_size=1,
                                 voxel_size=0.1, capacity=cap, max_pts=3,
                                 spatial_shape=np.asarray(ss, np.int32),
                                 use_coords=False, use_feats=False)
            g0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape,
                                       vb.n_voxels)
            plans = build_level_plans(
                g0, 7, 3, default_capacities(cap, 7),
                static_spatial_shape=tuple(ss), batch_size=1, rule_free=True)
            out = []
            for pp in plans:
                out.append(pp.grid.n_active)
                if pp.subm_spans is not None:
                    out.append(jnp.sum(pp.subm_spans.rd))
            return tuple(out)

        timeit("vox + rule-free plans (7 lvl)", vox_plans,
               [(params, state, v) for v in variants])
        for nb in range(1, 8):
            m2 = TreeLearn(channels=32, num_blocks=nb, spatial_shape=ss,
                           use_coords=False, use_feats=False)
            p2, s2 = m2.init(0)
            p2 = jax.device_put(p2)
            s2 = jax.device_put(s2)

            def fwd2(p_, s_, b, m2=m2):
                out, _ = m2.apply(p_, s_, b["coords"], b["input_feats"],
                                  b["batch_ids"], b["valid"], batch_size=1,
                                  voxel_capacity=cap, training=False,
                                  compute_dtype=jnp.bfloat16)
                return out["semantic_prediction_logits"]

            timeit(f"forward num_blocks={nb}", fwd2,
                   [(p2, s2, v) for v in variants])

    tdir = os.environ.get("TL_TRACE_DIR")
    if tdir:
        jax.profiler.start_trace(tdir)
        for v in variants:
            jax.block_until_ready(step_c.packed(params, state, v))
        jax.profiler.stop_trace()
        print(f"trace written to {tdir}")


if __name__ == "__main__":
    main()
