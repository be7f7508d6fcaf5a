"""Hard-forest pipeline ceiling: run grouping + remaining-point assignment
with GROUND-TRUTH offsets (the dataset's offset-label construction) in place
of model predictions.  This isolates the clustering/assignment stages from
the learned model: the resulting detection F1 is the ceiling any checkpoint
can reach on the hard generator.

Usage: python scripts/exp_oracle_ceiling.py [--trees 24] [--ppt 16000]
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def gt_offsets(coords: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """The dataset's offset-label construction (data/dataset.py parity:
    target = mean of the tree's lowest 0.5 m slab, z from the 3rd-lowest
    point) applied to a whole plot."""
    off = np.zeros_like(coords)
    for t in np.unique(labels):
        if t <= 0:
            continue
        m = labels == t
        pts = coords[m]
        z0 = np.partition(pts[:, 2], min(2, len(pts) - 1))[min(2, len(pts) - 1)]
        slab = pts[pts[:, 2] <= z0 + 0.5]
        base = np.array([slab[:, 0].mean(), slab[:, 1].mean(), z0])
        off[m] = base - pts
    return off


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", type=int, default=24)
    ap.add_argument("--ppt", type=int, default=16000)
    ap.add_argument("--extent", type=float, default=42.0)
    ap.add_argument("--seed", type=int, default=7777)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="sigma of xy noise added to the oracle offsets")
    args = ap.parse_args()

    import tempfile

    from treelearn_tpu.config import ConfigDict
    from treelearn_tpu.data.synthetic import make_synthetic_forest_hard
    from treelearn_tpu.ops.voxelize import voxel_downsample_trace_np
    from treelearn_tpu.pipeline.instances import (
        assign_remaining_points_nearest_neighbor, get_instances)
    from treelearn_tpu.train.selftrain import detection_f1_from_pointwise

    t0 = time.time()

    def log(m):
        print(f"[oracle +{time.time()-t0:6.1f}s] {m}", flush=True)

    data, _ = make_synthetic_forest_hard(
        n_trees=args.trees, extent=args.extent, points_per_tree=args.ppt,
        ground_points=int(args.extent ** 2 * 55), seed=args.seed)
    coords_all = data[:, :3].astype(np.float32)
    labels_all = data[:, 3].astype(np.int64)
    vox, idx, _ = voxel_downsample_trace_np(coords_all, 0.1)
    coords = vox.astype(np.float32)
    labels = labels_all[idx]
    log(f"{len(coords_all)} pts -> {len(coords)} voxels, "
        f"{labels.max()} trees")

    offs = gt_offsets(coords, labels)
    if args.noise:
        rng = np.random.default_rng(0)
        offs = offs + rng.normal(0, args.noise, offs.shape).astype(np.float32)
    # GT semantics as logits: tree (class 0) vs ground
    logits = np.where((labels > 0)[:, None],
                      np.array([10.0, -10.0], np.float32),
                      np.array([-10.0, 10.0], np.float32))

    grouping = ConfigDict.from_dict({
        "tau_group": 0.15, "tau_min": 50, "tau_off": 4, "tau_vert": 0.6,
        "tree_conf_thresh": 0.5, "use_hdbscan": False})
    preds = get_instances(coords, offs.astype(np.float32), logits, grouping,
                          None, 0, 0, -1, 1, search_radius=0.6)
    log(f"clusters: {preds.max()} (candidates filtered by verticality)")
    tree_mask = preds != 0
    preds[tree_mask] = assign_remaining_points_nearest_neighbor(
        (coords + offs)[tree_mask], preds[tree_mask], -1)
    # score with the bench's exact accounting (pointwise-npz protocol)
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        np.savez(f, instance_labels=labels, instance_preds=preds)
        pw = f.name
    q = detection_f1_from_pointwise(pw)
    log(f"oracle F1 {q['f1_score']}% completeness {q['completeness']}% "
        f"commission {q['commission_error_rate']}% "
        f"matched-IoU {q.get('mean_matched_iou')}% "
        f"({q['n_pred']} preds / {q['n_gt']} gt)")


if __name__ == "__main__":
    main()
