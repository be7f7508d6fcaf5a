"""Overfit probe: can the U-Net learn crown xy offsets on ONE hard crop?

Trains on a single hard-mode crop (no augmentation) and evaluates on the SAME
crop.  If crown xy offsets don't collapse toward zero error here, the
capacity/architecture is fine and the generalization recipe is the problem;
if they stay collapsed, something structural blocks the signal (loss, labels,
dtype).  Also logs semantic/offset loss components separately.
"""

import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--sem-mult", type=float, default=None,
                    help="report-only; loss uses the model default")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import tempfile

    from treelearn_tpu.data import TreeDataset, TreeLoader
    from treelearn_tpu.data.synthetic import make_synthetic_forest_hard, make_crop_npz, verticality_proxy
    from treelearn_tpu.model import TreeLearn
    from treelearn_tpu.train.loop import build_optimizer, make_train_step, make_eval_step

    T0 = time.time()

    def log(m):
        print(f"[probe +{time.time()-T0:6.1f}s] {m}", flush=True)

    extent = 30.0
    data, _ = make_synthetic_forest_hard(
        n_trees=12, extent=extent, points_per_tree=9000,
        ground_points=int(extent * extent * 55), seed=555)
    data[:, :2] -= extent / 2.0
    crops = tempfile.mkdtemp(prefix="probe_crops_")
    make_crop_npz(osp.join(crops, "crop_0.npz"), data, verticality_proxy(data))

    dataset = TreeDataset(crops, inner_square_edge_length=extent,
                          training=True, data_augmentations={})
    cap = 1 << 17
    loader = TreeLoader(dataset, batch_size=1, training=True, min_bucket=cap)

    side = int(np.ceil((extent + 4) / 0.1 / 64)) * 64
    model = TreeLearn(channels=32, num_blocks=7, kernel_size=3, dim_coord=3,
                      dim_feat=1, use_feats=False,
                      spatial_shape=[side, side, 256], voxel_size=0.1,
                      max_num_points_per_voxel=3)
    params, state = model.init(np.random.SeedSequence(0))
    optimizer = build_optimizer({"type": "AdamW", "lr": args.lr,
                                 "weight_decay": 1e-3},
                                grad_norm_clip=True)
    opt_state = optimizer.init(params)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    from treelearn_tpu.ops.voxelize import level_voxel_counts_np

    counts = level_voxel_counts_np(data[:, :3], 0.1, [side, side, 256], 7)
    caps = tuple(min(max(1 << int(np.ceil(np.log2(max(int(c * 1.35), 512)))),
                         512), cap) for c in counts)
    caps = (cap,) + caps[1:]
    log(f"level caps {caps} (measured {list(counts)})")
    step = make_train_step(model, optimizer, batch_size=1,
                           voxel_capacity=cap, compute_dtype=dtype,
                           level_capacities=caps)

    batch = next(iter(loader))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    for i in range(1, args.steps + 1):
        params, state, opt_state, loss, ld = step(params, state, opt_state,
                                                  jbatch)
        if i % 100 == 0 or i == 1:
            comps = {k: round(float(v), 3) for k, v in ld.items()
                     if not k.startswith("_")}
            ok = ld.get("_caps_ok")
            log(f"step {i}: total {float(loss):.3f} {comps} "
                f"caps_ok={bool(np.asarray(ok)) if ok is not None else '?'}")

    # evaluate offsets on the SAME crop (eval mode)
    eval_step = make_eval_step(model, batch_size=1, voxel_capacity=cap,
                               compute_dtype=jnp.float32, fast_conv=True)
    out = eval_step(params, state, jbatch)
    keep = np.asarray(batch["valid"])
    op = np.asarray(out["offset_predictions"])[keep]
    ol = batch["offset_labels"][keep]
    gt = batch["instance_labels"][keep] if "instance_labels" in batch else None
    coords = batch["coords"][keep]
    sem = batch["semantic_labels"][keep]
    tree = sem == 0
    base = coords[:, :2] + ol[:, :2]
    rad = np.linalg.norm(coords[:, :2] - base, axis=1)
    trunkish = tree & (rad < 0.3)
    crown = tree & (rad > 1.0)
    err = np.linalg.norm((op - ol)[:, :2], axis=1)
    pm = np.linalg.norm(op[:, :2], axis=1)
    lm = np.linalg.norm(ol[:, :2], axis=1)
    m = crown & (lm > 0.5)
    log(f"TRAIN-SET xy err: trunk med {np.median(err[trunkish]):.3f} "
        f"crown med {np.median(err[crown]):.3f} "
        f"crown p90 {np.percentile(err[crown], 90):.3f}")
    log(f"crown mag ratio med {np.median(pm[m]/lm[m]):.3f}")


if __name__ == "__main__":
    main()
