"""Hard-forest quality experiment harness (round 4).

Trains a selftrain recipe variant, runs whole-plot inference on a held-out
hard forest, and reports the quality chain end to end: offset error split by
trunk/crown, cluster-candidate composition, detection F1 after grouping, and
after remaining-point assignment.  Usage:

    python scripts/exp_hard_quality.py --steps 3000 --crops 32 --hard-frac 0.75
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--crops", type=int, default=12)
    ap.add_argument("--hard-frac", type=float, default=0.5)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--ppt", type=int, default=9000)
    ap.add_argument("--trees", type=int, default=24)
    ap.add_argument("--extent", type=float, default=42.0)
    ap.add_argument("--eval-ppt", type=int, default=16000)
    ap.add_argument("--skip-assign", action="store_true")
    ap.add_argument("--recipe-v", type=int, default=None,
                    help="override recipe version tag (cache key)")
    ap.add_argument("--crop-extent", type=float, default=None,
                    help="training crop extent (selftrain default 30)")
    ap.add_argument("--train-ppt", type=str, default=None,
                    help="training points-per-tree: int or 'lo:hi' range")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from treelearn_tpu.train import selftrain
    from treelearn_tpu.data.synthetic import make_synthetic_forest_hard

    def log(m):
        print(f"[exp +{time.time()-T0:6.1f}s] {m}", flush=True)

    T0 = time.time()
    model_cfg = {"channels": 32, "num_blocks": 7, "kernel_size": 3,
                 "dim_coord": 3, "dim_feat": 1, "use_feats": False,
                 "spatial_shape": [512, 512, 256], "voxel_size": 0.1,
                 "max_num_points_per_voxel": 3}
    kw = {}
    if args.recipe_v is not None:
        kw["recipe_v"] = args.recipe_v
    if args.crop_extent is not None:
        kw["crop_extent"] = args.crop_extent
    if args.train_ppt is not None:
        kw["ppt"] = (tuple(int(x) for x in args.train_ppt.split(":"))
                     if ":" in args.train_ppt else int(args.train_ppt))
    ckpt = selftrain.train_synthetic_checkpoint(
        dict(model_cfg), steps=args.steps, lr=args.lr, n_crops=args.crops,
        hard_frac=args.hard_frac, logger=log, log_every=200, **kw)
    log(f"checkpoint: {ckpt}")

    # held-out hard forest (different seed from ALL training crops)
    data, _ = make_synthetic_forest_hard(
        n_trees=args.trees, extent=args.extent,
        points_per_tree=args.eval_ppt,
        ground_points=int(args.extent ** 2 * 55), seed=7777)
    log(f"eval forest: {len(data)} pts, {int(data[:, 3].max())} trees")

    # pipeline on the eval forest
    import shutil
    import tempfile

    from treelearn_tpu.config import ConfigDict, get_config
    from treelearn_tpu.pipeline import run_treelearn_pipeline

    work = tempfile.mkdtemp(prefix="exp_hard_")
    forest_dir = osp.join(work, "plot", "forest")
    os.makedirs(forest_dir)
    fp = osp.join(forest_dir, "eval_forest.npz")
    np.savez(fp, points=data[:, :3].astype(np.float32), labels=data[:, 3])

    config = get_config(osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "configs", "pipeline", "pipeline.yaml"))
    config.forest_path = fp
    config.pretrain = ckpt
    config.tile_generation = True
    config.grouping.use_hdbscan = False
    config.save_cfg = ConfigDict.from_dict({
        "save_formats": [], "save_treewise": False,
        "save_pointwise": True, "return_type": "original",
        "save_backbone_feats": False, "results_dir": "results"})
    config.shape_cfg.outer_remove = None
    config.voxel_capacity = 1 << 18
    config.dataloader.batch_size = 1

    t0 = time.time()
    res = run_treelearn_pipeline(config)
    log(f"pipeline: {time.time()-t0:.1f}s stages={res['stage_seconds']}")

    pw = osp.join(res["results_dir"], "pointwise_results",
                  "pointwise_results.npz")
    z = np.load(pw)
    coords = z["coords"]
    op, ol = z["offset_predictions"], z["offset_labels"]
    gt = z["instance_labels"].astype(int)
    tree = gt > 0
    base = coords[:, :2] + ol[:, :2]
    rad = np.linalg.norm(coords[:, :2] - base, axis=1)
    trunkish = tree & (rad < 0.3)
    crown = tree & (rad > 1.0)
    err = np.linalg.norm((op - ol)[:, :2], axis=1)
    log(f"xy err: trunk med {np.median(err[trunkish]):.3f} "
        f"crown med {np.median(err[crown]):.3f} "
        f"crown p90 {np.percentile(err[crown], 90):.3f} "
        f"all-tree med {np.median(err[tree]):.3f}")
    pm = np.linalg.norm(op[:, :2], axis=1)
    lm = np.linalg.norm(ol[:, :2], axis=1)
    m = crown & (lm > 0.5)
    cos = (op[m, :2] * ol[m, :2]).sum(1) / (pm[m] * lm[m] + 1e-9)
    log(f"crown dir cos med {np.median(cos):.3f}; "
        f"mag ratio med {np.median(pm[m]/lm[m]):.3f}")

    from treelearn_tpu.train.selftrain import (
        detection_f1_from_pointwise, segmentation_partition_summary)

    q = detection_f1_from_pointwise(pw)
    log(f"detection: F1 {q['f1_score']}% completeness {q['completeness']}% "
        f"commission {q['commission_error_rate']}% "
        f"matched-IoU {q.get('mean_matched_iou')}% "
        f"({q['n_pred']} preds / {q['n_gt']} gt)")
    p = segmentation_partition_summary(pw)
    log(f"partitions: xy {p['xy_partition_mean_iou']}% "
        f"z {p['z_partition_mean_iou']}%")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
