"""Self-contained training on procedural synthetic forests.

Used by the benchmark to produce a *trained* flagship checkpoint so the
post-model pipeline stages (clustering, assignment) run on a realistic
prediction distribution and the run can be scored with detection F1 against
the synthetic ground truth — the reference's evaluation protocol
(reference tools/evaluation/evaluate.py:92-99) applied hermetically.

The checkpoint is cached on disk keyed by the training recipe fingerprint;
a warm bench run skips training entirely.
"""

from __future__ import annotations

import hashlib
import json
import os
import os.path as osp
import time
from typing import Optional

import numpy as np


def _recipe_key(model_cfg: dict, recipe: dict) -> str:
    blob = json.dumps({"model": model_cfg, "recipe": recipe}, sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


# The one benchmark training recipe (ADVICE r4): bench.py and
# scripts/warm_bench_ckpt.py both pass this dict, so the on-disk checkpoint
# cache key (an exact fingerprint of these values) cannot drift between the
# warm script and the bench.  From the scripts/exp_hard_quality.py sweep:
# 192 density-randomized crops x 6000 steps reaches hard-forest detection
# F1 81.8 / commission 10% / matched-IoU 80.2 held-out.
BENCH_RECIPE = {"steps": 6000, "n_crops": 192, "hard_frac": 0.8,
                "crop_extent": 24.0, "ppt": (10000, 16000), "lr": 1.5e-3}


def train_synthetic_checkpoint(
    model_cfg: dict,
    cache_dir: str = "/root/.cache/treelearn_bench",
    steps: int = 300,
    lr: float = 2e-3,
    batch_size: int = 1,
    voxel_capacity: int = 1 << 17,
    n_crops: int = 12,
    crop_extent: float = 30.0,
    seed0: int = 101,
    logger=None,
    log_every: int = 50,
    hard_frac: float = 0.5,
    recipe_v: int = 7,  # v7: branch-structured hard-crown generator
    ppt=9000,
    max_seconds: Optional[float] = None,
    save_every: int = 500,
    return_info: bool = False,
) -> str:
    """Train ``model_cfg`` on synthetic crops; return a checkpoint path.

    Resumable (VERDICT r4 item 1a): progress is persisted to a partial
    checkpoint (params + optimizer moments + step count) every ``save_every``
    steps, keyed by the same recipe fingerprint as the final artifact, so a
    killed run resumes from the last save instead of restarting the ~45 min
    schedule.  ``max_seconds`` bounds this invocation's wall clock: when it
    runs out the partial is saved and returned — the caller gets a weaker but
    usable checkpoint plus ``info["complete"]=False`` (``return_info=True``
    returns ``(path, info)``).

    Training data: ``n_crops`` independent synthetic mini-forests (cone
    crowns + trunks on undulating ground, data/synthetic.py) with offset
    labels computed by the TreeDataset machinery (3rd-lowest-z base
    regularization, reference dataset.py:111-140).  The verticality input
    feature is a proxy; with the reference default ``use_feats=False`` the
    model input is all-ones and features only matter to the grouping stage,
    which uses the real geometric kernel at inference.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from ..data import TreeDataset, TreeLoader
    from ..data.synthetic import (make_crop_npz, make_synthetic_forest,
                                  make_synthetic_forest_hard, verticality_proxy)
    from ..model import TreeLearn
    from ..model.checkpoint import (load_native_checkpoint,
                                    opt_state_from_flat, opt_state_to_flat,
                                    save_checkpoint)
    from .loop import build_optimizer, make_train_step

    recipe = {"steps": steps, "lr": lr, "batch_size": batch_size,
              "voxel_capacity": voxel_capacity, "n_crops": n_crops,
              "crop_extent": crop_extent, "seed0": seed0, "v": recipe_v}
    if hard_frac != 0.5:
        recipe["hard_frac"] = hard_frac
    if ppt != 9000:
        recipe["ppt"] = ppt
    mc = dict(model_cfg)
    # training-time spatial bound for the crop extent (the dense probe
    # tables scale with it; the checkpoint is shape-independent)
    side = int(np.ceil((crop_extent + 4) / 0.1 / 64)) * 64
    mc["spatial_shape"] = [side, side, 256]
    key = _recipe_key(mc, recipe)
    os.makedirs(cache_dir, exist_ok=True)
    ckpt_path = osp.join(cache_dir, f"selftrain_{key}.npz")
    partial_path = osp.join(cache_dir, f"selftrain_{key}_partial.npz")
    if osp.isfile(ckpt_path):
        if logger:
            logger(f"selftrain: cached checkpoint {ckpt_path}")
        info = {"complete": True, "completed_steps": steps,
                "target_steps": steps, "cached": True}
        return (ckpt_path, info) if return_info else ckpt_path

    t0 = time.time()
    crops_dir = tempfile.mkdtemp(prefix="selftrain_crops_")
    n_easy = max(int(round(n_crops * (1.0 - hard_frac))), 1)
    ppt_rng = np.random.default_rng(seed0)
    for i in range(n_crops):
        # mixed easy cones / hard-mode geometry (interlocking crowns,
        # understory, occlusion, density gradients) so the checkpoint is a
        # meaningful anchor for BOTH benchmark passes; hard_frac sets the mix
        gen = make_synthetic_forest if i < n_easy else make_synthetic_forest_hard
        # ppt as a (lo, hi) pair randomizes per-crop point density: the
        # occupancy-only model (use_feats/use_coords false) is density-
        # sensitive, and the benchmark plots run ~2x denser than the round-3
        # fixed 9000-ppt recipe trained at
        crop_ppt = (int(ppt_rng.integers(ppt[0], ppt[1] + 1))
                    if isinstance(ppt, (tuple, list)) else int(ppt))
        data, _ = gen(
            n_trees=max(int(crop_extent * crop_extent / 75), 3),
            extent=crop_extent, points_per_tree=crop_ppt,
            ground_points=int(crop_extent * crop_extent * 55),
            seed=seed0 + i)
        data[:, :2] -= crop_extent / 2.0  # crops are xy-centered
        make_crop_npz(osp.join(crops_dir, f"crop_{i}.npz"), data,
                      verticality_proxy(data))

    dataset = TreeDataset(crops_dir, inner_square_edge_length=crop_extent,
                          training=True,
                          data_augmentations={"jitter": True, "flip": True,
                                              "rot": True, "scaled": False,
                                              "point_jitter": False})
    loader = TreeLoader(dataset, batch_size=batch_size, training=True,
                        min_bucket=voxel_capacity)

    # Per-level capacities measured from the actual crops (+35% headroom for
    # the rotation/jitter augmentations), NOT the halve-per-level default:
    # dense synthetic crops keep ~55-65% of voxels across a downsample, so
    # the default silently truncated level 1+ — the deep U-Net levels (the
    # long-range context crown offsets need) trained on dropped voxels, which
    # is exactly the round-3 "crown offsets collapse to zero" failure.
    from ..ops.voxelize import level_voxel_counts_np

    def _pow2(x):
        return 1 << int(np.ceil(np.log2(max(int(x), 1))))

    vs = float(mc.get("voxel_size", 0.1))
    nb = int(mc.get("num_blocks", 7))
    max_counts = np.zeros(nb, np.int64)
    for i in range(n_crops):
        pts = np.load(osp.join(crops_dir, f"crop_{i}.npz"))["points"]
        counts = level_voxel_counts_np(pts.astype(np.float64), vs,
                                       mc["spatial_shape"], nb)
        max_counts = np.maximum(max_counts, counts)
    level_capacities = tuple(
        min(max(_pow2(int(c * 1.35)), 512), voxel_capacity)
        for c in max_counts)
    if level_capacities[0] < voxel_capacity:
        level_capacities = (voxel_capacity,) + level_capacities[1:]
    if logger:
        logger(f"selftrain: level caps {level_capacities} "
               f"(measured {max_counts.tolist()})")

    model = TreeLearn(**mc)
    params, state = model.init(np.random.SeedSequence(seed0))
    # per-step cosine decay (recipe v3): the constant-lr run left the mixed
    # easy/hard curriculum noisy at the end (loss spikes at step 200+ and a
    # 99->93 easy-F1 regression); cosine to lr/20 settles both passes
    optimizer = build_optimizer(
        {"type": "AdamW", "lr": lr, "weight_decay": 1e-3},
        scheduler_cfg={"t_initial": steps, "warmup_t": min(30, steps // 10),
                       "lr_min": lr / 20, "warmup_lr_init": lr / 100},
        steps_per_epoch=1, grad_norm_clip=True)
    opt_state = optimizer.init(params)

    start_step = 0
    if osp.isfile(partial_path):
        # resume: the partial carries params + state + optimizer moments
        # (incl. the cosine schedule's step counter inside optax) + step count
        try:
            params, state, opt_flat, start_step = load_native_checkpoint(
                partial_path)
            opt_state = opt_state_from_flat(opt_flat, opt_state)
            if logger:
                logger(f"selftrain: resuming from step {start_step} "
                       f"({partial_path})")
        except Exception as e:  # corrupt partial (e.g. killed mid-write
            # before os.replace): start over rather than fail the bench
            start_step = 0
            if logger:
                logger(f"selftrain: partial unreadable "
                       f"({type(e).__name__}: {e}); restarting")

    step_fn = make_train_step(model, optimizer, batch_size=batch_size,
                              voxel_capacity=voxel_capacity,
                              compute_dtype=jnp.bfloat16,
                              level_capacities=level_capacities)

    def _save_partial(n_done):
        # tmp must end in .npz (np.savez appends it otherwise)
        tmp = partial_path[:-4] + f"_tmp{os.getpid()}.npz"
        save_checkpoint(tmp, jax.device_get(params), jax.device_get(state),
                        opt_state_flat=opt_state_to_flat(
                            jax.device_get(opt_state)),
                        epoch=n_done)
        os.replace(tmp, partial_path)

    n_done = start_step
    n_skipped = 0
    losses = []
    out_of_time = False
    while n_done < steps and not out_of_time:
        for batch in loader:
            if n_done >= steps:
                break
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            params, state, opt_state, loss, ld = step_fn(
                params, state, opt_state, jbatch)
            caps_ok = ld.get("_caps_ok")
            if caps_ok is not None and not bool(np.asarray(caps_ok)):
                # the update was a no-op in-program (capacity overflow):
                # count it — a silent stream of no-ops trains nothing
                n_skipped += 1
                if logger and n_skipped in (1, 10, 100):
                    logger(f"selftrain: capacity overflow at step {n_done} "
                           f"({n_skipped} skipped so far, counts "
                           f"{np.asarray(ld.get('_n_voxels_per_level'))})")
            n_done += 1
            if n_done % log_every == 0 or n_done == steps:
                losses.append(float(loss))
                if logger:
                    comps = {k: round(float(v), 3) for k, v in ld.items()
                             if not k.startswith("_")}
                    logger(f"selftrain: step {n_done}/{steps} "
                           f"loss {losses[-1]:.3f} {comps} "
                           f"({time.time() - t0:.0f}s)")
            if n_done % save_every == 0 and n_done < steps:
                _save_partial(n_done)
            if (max_seconds is not None and n_done < steps
                    and time.time() - t0 > max_seconds):
                out_of_time = True
                break
    if losses and not np.isfinite(losses[-1]):
        raise RuntimeError(f"selftrain diverged: losses {losses}")
    done_this_run = n_done - start_step
    if done_this_run and n_skipped > done_this_run // 4:
        raise RuntimeError(
            f"selftrain: {n_skipped}/{done_this_run} steps were "
            "capacity-overflow no-ops; raise voxel_capacity or shrink crops")
    if out_of_time:
        # budget exhausted: hand back the partial — weaker weights beat a
        # benchmark that emits nothing (VERDICT r4 item 1)
        _save_partial(n_done)
        if logger:
            logger(f"selftrain: budget ({max_seconds:.0f}s) exhausted at step "
                   f"{n_done}/{steps}; returning partial checkpoint")
        info = {"complete": False, "completed_steps": n_done,
                "target_steps": steps, "cached": False}
        return (partial_path, info) if return_info else partial_path
    params = jax.device_get(params)
    state = jax.device_get(state)
    save_checkpoint(ckpt_path, params, state, epoch=0)
    if osp.isfile(partial_path):
        os.remove(partial_path)
    if logger:
        logger(f"selftrain: done in {time.time() - t0:.0f}s -> {ckpt_path}")
    info = {"complete": True, "completed_steps": steps,
            "target_steps": steps, "cached": False}
    return (ckpt_path, info) if return_info else ckpt_path


def segmentation_partition_summary(pointwise_npz: str) -> dict:
    """Mean xy/z partition IoU over matched trees (reference protocol:
    tools/evaluation/evaluate.py:92-116 with the 10-bin partitions of
    configs/evaluation/evaluate.yaml) — the hard-mode benchmark's regression
    anchors for clustering quality."""
    import numpy as np

    from ..eval import (evaluate_xy_partition, evaluate_z_partition,
                        get_detections)
    from ..pipeline.instances import make_labels_consecutive

    z = np.load(pointwise_npz)
    coords = z["coords"].astype(np.float64)
    gt = z["instance_labels"].astype(np.int64)
    pred = z["instance_preds"].astype(np.int64)

    gt = np.where(gt == 0, -1, gt)
    mapping_gt = {-1: -1}
    m = gt != -1
    if m.any():
        gt[m], mg = make_labels_consecutive(gt[m], start_num=0)
        mapping_gt.update(mg)
    pred = np.where(pred == 0, -1, pred)
    mapping_pred = {-1: -1}
    m = pred != -1
    if m.any():
        pred[m], mp = make_labels_consecutive(pred[m], start_num=0)
        mapping_pred.update(mp)

    _, _, iou, _, _ = get_detections(gt, pred, min_iou_match=0.5,
                                     non_tree_label=-1)
    unique_gts = np.arange(iou.shape[1])
    unique_preds = iou.argmax(axis=0)
    intvls = [round(0.1 * i, 1) for i in range(11)]
    xy = evaluate_xy_partition(pred, gt, unique_gts, unique_preds, coords,
                               intvls, mapping_gt, mapping_pred)
    zp = evaluate_z_partition(pred, gt, unique_gts, unique_preds, coords,
                              intvls, mapping_gt, mapping_pred)
    xy_iou = [c for c in xy.columns if c.startswith("iou_")]
    z_iou = [c for c in zp.columns if c.startswith("iou_")]
    return {
        "xy_partition_mean_iou": round(
            float(np.nanmean(xy[xy_iou].values)) * 100, 1),
        "z_partition_mean_iou": round(
            float(np.nanmean(zp[z_iou].values)) * 100, 1),
    }


def detection_f1_from_pointwise(pointwise_npz: str) -> dict:
    """Score a pipeline run's pointwise_results.npz against the ground-truth
    instance labels it carries (detection protocol of the reference:
    tools/evaluation/evaluate.py:92-99 via our eval stack)."""
    from ..eval import detection_summary, get_detection_failures, get_detections
    from ..pipeline.instances import make_labels_consecutive

    z = np.load(pointwise_npz)
    gt = z["instance_labels"].astype(np.int64)
    pred = z["instance_preds"].astype(np.int64)

    gt = np.where(gt == 0, -1, gt)          # raw convention: 0 = non-tree
    m = gt != -1
    if m.any():
        gt[m], _ = make_labels_consecutive(gt[m], start_num=0)
    pred = np.where(pred == 0, -1, pred)    # grouping: 0 = non-tree
    m = pred != -1
    if m.any():
        pred[m], _ = make_labels_consecutive(pred[m], start_num=0)

    matched_gts, matched_preds, iou, prec, rec = get_detections(
        gt, pred, min_iou_match=0.5, non_tree_label=-1)
    uniq_gt = np.arange(gt.max() + 1)
    uniq_pred = np.arange(pred.max() + 1)
    (nm_gts, nm_preds, nmp_gt, _, _) = get_detection_failures(
        matched_gts, matched_preds, uniq_gt, uniq_pred, iou, prec, rec,
        min_precision_for_pred=0.5, min_recall_for_gt=0.5)
    nmp_filtered = np.array([p for p, g in zip(nm_preds, nmp_gt)
                             if not np.isnan(g)])
    summary = detection_summary(matched_gts, nm_gts, matched_preds,
                                nmp_filtered)
    # mean pointwise segmentation quality over matched pairs
    if len(matched_preds):
        seg_iou = float(np.mean(iou[matched_preds, matched_gts]))
        summary["mean_matched_iou"] = round(seg_iou * 100, 1)
    summary["n_gt"] = int(gt.max() + 1)
    summary["n_pred"] = int(pred.max() + 1)
    return summary
