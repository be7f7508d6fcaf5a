"""Attribute the pipeline cluster/assign/propagate stage time from a saved
pointwise_results.npz (the bench writes one under bench_workdir).

Usage: python scripts/profile_cluster.py [pointwise_results.npz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PW = (sys.argv[1] if len(sys.argv) > 1 else
      "/root/repo/bench_workdir/plot/results/pointwise_results/pointwise_results.npz")


def main():
    from treelearn_tpu.pipeline.instances import (
        assign_remaining_points_nearest_neighbor, get_instances, softmax_np)
    from treelearn_tpu.config import ConfigDict

    z = np.load(PW)
    coords = z["coords"]
    offs = z["offset_predictions"]
    logits = z["semantic_prediction_logits"]
    n = len(coords)
    print(f"points: {n}")

    grouping = ConfigDict.from_dict({
        "tree_conf_thresh": 0.5, "tau_vert": 0.6, "tau_off": 4.0,
        "tau_group": 0.15, "tau_min": 50, "use_hdbscan": False,
    })

    # --- sub-steps of get_instances, timed individually ---------------------
    t0 = time.time()
    probs = softmax_np(np.asarray(logits, np.float64))
    tree_mask = probs[:, 0] >= grouping.tree_conf_thresh
    offset_mask = np.abs(offs[:, 2]) < grouping.tau_off
    pre = np.where(tree_mask & offset_mask)[0]
    print(f"masks: {time.time()-t0:.2f}s  (pre-filter candidates: {len(pre)})")

    t0 = time.time()
    from treelearn_tpu.ops.features import compute_verticality
    vert = compute_verticality(coords[:, :3].astype(np.float32),
                               search_radius=0.6, query_idx=pre)
    print(f"deferred verticality: {time.time()-t0:.2f}s")

    vertical_mask = np.zeros(n, bool)
    vertical_mask[pre] = vert[:, 0] > grouping.tau_vert
    mask_cluster = tree_mask & vertical_mask & offset_mask
    filtered_xy = ((coords + offs)[mask_cluster][:, :2]).astype(np.float32)
    print(f"cluster candidates: {mask_cluster.sum()}")

    t0 = time.time()
    from treelearn_tpu.ops.cluster import dbscan_cluster
    labels = dbscan_cluster(filtered_xy, eps=grouping.tau_group,
                            min_size=grouping.tau_min,
                            not_assigned_label=-2, start_num=1)
    print(f"dbscan_cluster: {time.time()-t0:.2f}s "
          f"({len(np.unique(labels[labels>0]))} clusters)")

    # breakdown inside dbscan (TPU path): cc_labels_banded + relabel
    import jax
    if jax.default_backend() == "tpu":
        from treelearn_tpu.ops.pallas_cc import cc_labels_banded
        from treelearn_tpu.ops.cluster import relabel_components_np
        t0 = time.time()
        comp = cc_labels_banded(filtered_xy, float(grouping.tau_group))
        print(f"  cc_labels_banded: {time.time()-t0:.2f}s")
        t0 = time.time()
        relabel_components_np(comp, grouping.tau_min, -2, 1)
        print(f"  relabel_components_np: {time.time()-t0:.2f}s")

    # --- full get_instances (the stage timer's scope) ------------------------
    t0 = time.time()
    preds = get_instances(coords, offs, logits, grouping, None, 0, 0, -2, 1,
                          search_radius=0.6)
    print(f"get_instances total: {time.time()-t0:.2f}s")

    # --- assign_remaining ----------------------------------------------------
    t0 = time.time()
    tm = preds != 0
    out = assign_remaining_points_nearest_neighbor(
        (coords + offs)[tm], preds[tm], -2)
    print(f"assign_remaining: {time.time()-t0:.2f}s")

    # --- propagate (5-NN majority to the original cloud) ---------------------
    orig = np.load("/root/repo/bench_workdir/plot/forest/bench_forest_centered.npz")
    opts = orig["points"]
    t0 = time.time()
    from treelearn_tpu.pipeline.instances import propagate_preds
    _ = propagate_preds(coords, preds.astype(np.int64), opts[:len(opts)//1])
    print(f"propagate 5-NN to {len(opts)} pts: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
