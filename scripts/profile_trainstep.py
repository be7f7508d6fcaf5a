"""Time the train step on real TPU at the round-2 anchor shape (262k pts,
2^17 voxel capacity): rule-free "zeros" program vs the exact materialized-
rule fallback (fast_conv=True).

VERDICT r2 item 2's done-bar: train step at 262k pts <= 0.25 s with the
rule-free path as the default.

Usage: python scripts/profile_trainstep.py [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.data import TreeDataset, TreeLoader
from treelearn_tpu.data.synthetic import make_crop_npz, make_synthetic_forest, verticality_proxy
from treelearn_tpu.model import TreeLearn
from treelearn_tpu.train.loop import build_optimizer, make_train_step


def make_batches(n_batches=4, crop_extent=30.0, voxel_capacity=1 << 17):
    import tempfile

    crops_dir = tempfile.mkdtemp(prefix="profile_train_crops_")
    for i in range(n_batches):
        data, _ = make_synthetic_forest(
            n_trees=max(int(crop_extent * crop_extent / 75), 3),
            extent=crop_extent, points_per_tree=9000,
            ground_points=int(crop_extent * crop_extent * 55),
            seed=501 + i)
        data[:, :2] -= crop_extent / 2.0
        make_crop_npz(os.path.join(crops_dir, f"crop_{i}.npz"), data,
                      verticality_proxy(data))
    dataset = TreeDataset(crops_dir, inner_square_edge_length=crop_extent,
                          training=True,
                          data_augmentations={"jitter": True, "flip": True,
                                              "rot": True, "scaled": False,
                                              "point_jitter": False})
    loader = TreeLoader(dataset, batch_size=1, training=True,
                        min_bucket=voxel_capacity)
    batches = []
    for batch in loader:
        batches.append({k: jnp.asarray(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)})
        if len(batches) >= n_batches:
            break
    return batches


def time_step(label, step_fn, params, state, opt_state, batches, reps=6):
    p, s, o = params, state, opt_state
    t0 = time.perf_counter()
    p, s, o, loss, _ = step_fn(p, s, o, batches[0])
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(reps):
        b = batches[1 + i % (len(batches) - 1)]
        t0 = time.perf_counter()
        p, s, o, loss, ld = step_fn(p, s, o, b)
        float(loss)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{label:42s} {best*1e3:8.1f} ms/step  (compile+first {compile_s:.1f}s, "
          f"loss {float(loss):.3f})")
    return best


def main():
    voxel_capacity = 1 << 17
    crop_extent = 30.0
    side = int(np.ceil((crop_extent + 4) / 0.1 / 64)) * 64
    mc = dict(channels=32, num_blocks=7, spatial_shape=[side, side, 256])

    batches = make_batches(voxel_capacity=voxel_capacity)
    n_pts = int(batches[0]["coords"].shape[0])
    print(f"batch rows {n_pts}, voxel capacity {voxel_capacity}")

    model = TreeLearn(**mc)
    params, state = model.init(np.random.SeedSequence(7))
    optimizer = build_optimizer({"type": "AdamW", "lr": 2e-3,
                                 "weight_decay": 1e-3}, grad_norm_clip=True)
    opt_state = optimizer.init(params)

    for label, fast_conv in [("rule-free (fast_conv='zeros', default)", "zeros"),
                             ("materialized rules (fast_conv=True)", True)]:
        step = make_train_step(model, optimizer, batch_size=1,
                               voxel_capacity=voxel_capacity,
                               compute_dtype=jnp.bfloat16,
                               fast_conv=fast_conv)
        # donated args: re-init per program
        p, s = model.init(np.random.SeedSequence(7))
        o = optimizer.init(p)
        time_step(label, step, p, s, o, batches)


if __name__ == "__main__":
    main()
