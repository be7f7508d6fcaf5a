"""End-to-end segmentation pipeline orchestrator.

Parity: run_treelearn_pipeline (reference tools/pipeline/pipeline.py:22-200):
load forest -> center coords -> tile -> pointwise inference -> ensemble ->
[hull/outer-remove] -> instances -> assign remaining -> [save pointwise] ->
propagate to voxelized/original cloud -> de-center -> save full forest +
per-tree files.
"""

from __future__ import annotations

import os
import os.path as osp
import pprint
import shutil
import time
from typing import Optional

import numpy as np

from ..config import config_to_dict
from ..data.dataset import TreeDataset, TreeLoader
from ..io.pointcloud import load_data, save_data
from ..logging_utils import get_root_logger
from ..model import TreeLearn, load_checkpoint
from .ensemble import ensemble_named, ensemble_named_by_id, propagate_by_key
from .hull import HullRaster
from .inference import get_pointwise_preds
from .instances import (
    assign_remaining_points_nearest_neighbor,
    get_cluster_means,
    get_instances,
    make_labels_consecutive,
    propagate_preds,
)
from .tiles import generate_tiles
from .windows import select_level_caps, select_level_windows
from ..utils.timing import substage

TREE_CLASS_IN_DATASET = 0
NON_TREES_LABEL_IN_GROUPING = 0
NOT_ASSIGNED_LABEL_IN_GROUPING = -1
START_NUM_PREDS = 1

# (pretrain path, model config) -> loaded (params, state): multi-plot serving
# re-enters the pipeline with the same checkpoint; loading it (and re-staging
# its device copy, pipeline/inference.py) costs ~0.5 s per plot otherwise
_CHECKPOINT_CACHE: dict = {}


def save_treewise(coords, instance_preds, cluster_means_within_hull,
                  insts_not_at_edge, save_format, plot_results_dir,
                  non_trees_label=NON_TREES_LABEL_IN_GROUPING):
    """Per-tree output files in three edge categories
    (parity: reference util/pipeline.py:397-419)."""
    coords = coords - np.mean(coords, axis=0)
    dirs = {
        "completely_inside": osp.join(plot_results_dir, "completely_inside"),
        "trunk_base_inside": osp.join(plot_results_dir, "trunk_base_inside"),
        "trunk_base_outside": osp.join(plot_results_dir, "trunk_base_outside"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # non-trees + any never-assigned points (labels <= non_trees_label) land
    # in one non_trees file; tree instances are labels 1..K
    nt_mask = instance_preds <= non_trees_label
    if nt_mask.any():
        pred_coord = np.hstack([coords[nt_mask],
                                non_trees_label * np.ones((nt_mask.sum(), 1))])
        save_data(pred_coord, save_format, "non_trees", plot_results_dir,
                  use_offset=False)
    for i in np.unique(instance_preds):
        if i <= non_trees_label:
            continue
        pred_coord = coords[instance_preds == i]
        pred_coord = np.hstack([pred_coord, i * np.ones((len(pred_coord), 1))])
        idx = int(i) - 1
        if cluster_means_within_hull[idx] and insts_not_at_edge[idx]:
            save_data(pred_coord, save_format, str(int(i)),
                      dirs["completely_inside"], use_offset=False)
        elif cluster_means_within_hull[idx] and not insts_not_at_edge[idx]:
            save_data(pred_coord, save_format, str(int(i)),
                      dirs["trunk_base_inside"], use_offset=False)
        else:
            save_data(pred_coord, save_format, str(int(i)),
                      dirs["trunk_base_outside"], use_offset=False)


def run_treelearn_pipeline(config, config_path: Optional[str] = None,
                           params=None, state=None, logger=None):
    """Run the full segmentation pipeline; returns a result summary dict."""
    t_start = time.time()
    stage_seconds = {}
    _last = [t_start]

    def _stage(name):
        now = time.time()
        stage_seconds[name] = round(now - _last[0], 2)
        _last[0] = now
        logger.info(f"stage[{name}]: {stage_seconds[name]:.2f}s")

    plot_name = osp.basename(config.forest_path)[:-4]
    base_dir = osp.dirname(osp.dirname(config.forest_path))
    documentation_dir = osp.join(base_dir, "documentation")
    voxelized_dir = osp.join(base_dir, f"forest_voxelized{config.sample_generation.voxel_size}")
    tiles_dir = osp.join(base_dir, "tiles")
    results_dir = osp.join(base_dir, getattr(config.save_cfg, "results_dir", "results"))
    for d in (documentation_dir, voxelized_dir, tiles_dir, results_dir):
        os.makedirs(d, exist_ok=True)

    logger = logger or get_root_logger(osp.join(documentation_dir, "log_pipeline.txt"))
    logger.info(pprint.pformat(config_to_dict(config), indent=2))
    if config_path is not None:
        shutil.copy(config_path, osp.join(documentation_dir, osp.basename(config_path)))

    # center coords (the reference's large-coordinate workaround,
    # tools/pipeline/pipeline.py:39-50) and re-save as npz
    data = load_data(config.forest_path)
    xyz = data[:, :3].astype(np.float64)
    xyz_mean = np.mean(xyz, 0)
    centered_path = osp.join(osp.dirname(config.forest_path), plot_name + "_centered.npz")
    # keep the label column: the reference re-saves coords AND labels
    # (pipeline.py:46-50); labels ride through voxelization (first-point-per-
    # voxel) into the pointwise dump, where the evaluation joins on them
    centered_pts = (xyz - xyz_mean).astype(np.float32)
    np.savez(centered_path, points=centered_pts,
             labels=(data[:, 3] if data.shape[1] > 3
                     else np.full(len(data), -1.0)))
    config.forest_path = centered_path
    del data, xyz
    _stage("load_center")

    # tiles: streaming mode (default) slices tiles in memory from the sorted
    # voxelized plot; npz mode writes them to disk like the reference
    streaming = bool(config.get("streaming", True))
    config.dataset_test.data_root = osp.join(tiles_dir, "npz")
    if streaming:
        from .tiles import prepare_voxelized_features

        # models that ignore input features (use_feats false, the reference
        # default) don't need whole-plot verticality up front — the grouping
        # stage computes it lazily over its candidate points only
        defer_features = not bool(config.model.get("use_feats", False))
        vox_path, feat_path, vox_arrays = prepare_voxelized_features(
            config.sample_generation, config.forest_path, logger,
            config.save_cfg.return_type, skip_features=defer_features)
        _stage("voxelize_features")
    elif config.tile_generation:
        logger.info("#################### generating tiles ####################")
        generate_tiles(config.sample_generation, config.forest_path, logger,
                       config.save_cfg.return_type)

    # model + pointwise predictions
    logger.info(f"{plot_name}: #################### getting pointwise predictions ####################")
    import jax
    import jax.numpy as jnp

    model = TreeLearn(**config.model)
    if params is None:
        ck_key = (config.get("pretrain"), model.config_key())
        cached = _CHECKPOINT_CACHE.get(ck_key)
        if cached is not None:
            params, state = cached
        else:
            params, state = model.init(0)  # int seed: no device round trip
            if config.get("pretrain"):
                params, state, _ = load_checkpoint(config.pretrain, params,
                                                   state, logger)
            _CHECKPOINT_CACHE.clear()  # one live entry: bound memory
            _CHECKPOINT_CACHE[ck_key] = (params, state)
    if streaming:
        from .streaming import TileStream

        if vox_arrays is not None:
            vox_pts = vox_arrays[0].astype(np.float64)
            vox_labels = vox_arrays[1]
        else:
            vox = np.load(vox_path)
            vox_pts = vox["points"].astype(np.float64)
            vox_labels = vox["labels"]
        feats_arr = (np.zeros((len(vox_pts), 1), np.float32)
                     if feat_path is None
                     else np.load(feat_path)["features"])
        stream = TileStream(
            vox_pts, vox_labels,
            feats_arr, config.sample_generation.inner_edge,
            config.sample_generation.outer_edge, config.sample_generation.stride)
        # Whole-plot single-pass inference (TPU-native; see TileStream
        # .whole_plot_batches): on when the plot fits the device, replacing
        # the reference's overlapping 35 m context windows and their ~77x
        # voxel recompute.  'auto' (default) switches on the voxel count;
        # set whole_plot: false for exact tile-decomposition parity.
        whole_plot = config.get("whole_plot", "auto")
        # 2^23-voxel ceiling (~8.4M active voxels, ~2.5 GB of plans +
        # activations in 16 GB HBM).  The former 2^22 SMEM bound is gone: the
        # window-start tables stream as per-tile SMEM blocks
        # (ops/pallas_conv.py:_lo_rows).  Plots beyond the ceiling stream
        # tiles.
        wp_max = int(config.get("whole_plot_max_voxels", 1 << 23))
        use_wp = (whole_plot is True
                  or (whole_plot == "auto" and len(vox_pts) <= wp_max))
        if use_wp:
            def _pow2(x):
                return 1 << int(np.ceil(np.log2(max(int(x), 1))))

            vs = float(config.model.get("voxel_size", 0.1))
            ext = vox_pts.max(axis=0) - vox_pts.min(axis=0)
            # bucket the spatial shape to multiples of 64: plots of similar
            # extent then share ONE compiled program (an exact per-plot shape
            # would recompile + re-upload the executable for every plot —
            # the dominant cost on a tunneled device)
            ss = [int(np.ceil((np.ceil(e / vs) + 2) / 64)) * 64 for e in ext]
            logger.info(f"whole-plot inference: {len(vox_pts)} voxels, "
                        f"spatial_shape {ss}")
            model_cfg = dict(config.model)
            model_cfg["spatial_shape"] = ss
            model = TreeLearn(**model_cfg)
            voxel_capacity_run = _pow2(max(len(vox_pts),
                                           int(config.get("voxel_capacity", 1 << 14))))
            # measured per-level capacities: the halve-per-level default
            # schedule under-provisions on occlusion-thinned clouds (a
            # sparse plot can keep ~65% of voxels across a downsample, not
            # 50%); count the exact per-level active sets on the host (ms)
            # and bucket each to pow2 so similar plots share one program
            from ..ops.voxelize import level_voxel_counts_np

            lvl_counts = level_voxel_counts_np(
                vox_pts, vs, ss, int(config.model.get("num_blocks", 7)))
            level_caps = select_level_caps(lvl_counts, voxel_capacity_run)
            # measured per-level conv windows (VERDICT r4 items 4/5): the
            # fixed 3x-tile window both overpays the selection tax on sparse
            # plots and overflows into the exact-XLA fallback on dense ones
            # (a 4M-voxel fallback crashed the TPU worker).  Selection
            # formulas shared with the bench/probes in pipeline/windows.py.
            from ..model.blocks import level_tile_window
            from ..ops.voxelize import level_span_windows_np

            nb = int(config.model.get("num_blocks", 7))
            tiles = [level_tile_window(32 * (l + 1))[0] for l in range(nb)]
            req = level_span_windows_np(vox_pts, vs, ss, nb, tiles, slack=0)
            level_windows = select_level_windows(req, level_caps)
            logger.info(f"measured level windows {level_windows} "
                        f"(required {req})")
            loader = stream.whole_plot_batches(min_bucket=voxel_capacity_run)
        else:
            # one shape bucket = one XLA compilation; dead-tile skipping in
            # the banded kernel makes the padding nearly free
            loader = stream.batches(
                batch_size=config.dataloader.batch_size,
                inner_square_edge_length=config.dataset_test.inner_square_edge_length,
                min_bucket=int(config.get("voxel_capacity", 1 << 20)))
    else:
        dataset = TreeDataset(**config.dataset_test, logger=logger)
        loader = TreeLoader(dataset, batch_size=config.dataloader.batch_size,
                            training=False)
    compute_dtype = jnp.bfloat16 if config.get("fp16") else jnp.float32
    voxel_capacity = int(config.get("voxel_capacity", 1 << 20))
    level_capacities = None
    level_windows_arg = None
    if streaming and use_wp:
        voxel_capacity = voxel_capacity_run
        level_capacities = level_caps
        level_windows_arg = level_windows
    mesh = None
    if config.get("dist") and len(jax.devices()) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh()
    model_timings = {}
    # the 32-ch backbone features are only consumed by the pointwise-results
    # dump; skipping their D2H transfer dominates tunneled-device wall time
    pointwise = get_pointwise_preds(model, params, state, loader,
                                    voxel_capacity=voxel_capacity,
                                    level_capacities=level_capacities,
                                    level_windows=level_windows_arg,
                                    compute_dtype=compute_dtype, logger=logger,
                                    timings=model_timings, mesh=mesh,
                                    need_backbone=bool(
                                        config.save_cfg.save_pointwise
                                        and config.save_cfg.get(
                                            "save_backbone_feats", True)))
    # the MFU pure-step re-dispatch inside get_pointwise_preds is
    # instrumentation, not pipeline work — keep it out of the stage time
    _last[0] += model_timings.get("timing_rerun_s", 0.0)
    _stage("inference")
    (semantic_prediction_logits, semantic_labels, offset_predictions,
     offset_labels, coords, instance_labels, backbone_feats, input_feats,
     point_ids) = pointwise

    # ensemble overlapping predictions
    logger.info(f"{plot_name}: #################### ensembling predictions ####################")
    if point_ids is not None:
        # id-plumbed path (streaming loaders): group by the integer
        # original-cloud row id each point carried through inference — no
        # coordinate quantization, and the surviving ids turn the later
        # propagate stage into an O(V) scatter instead of a second join
        (point_ids, coords, semantic_prediction_logits, semantic_labels,
         offset_predictions, offset_labels, instance_labels, backbone_feats,
         input_feats) = ensemble_named_by_id(
            point_ids, coords, semantic_prediction_logits, semantic_labels,
            offset_predictions, offset_labels, instance_labels,
            backbone_feats, input_feats)
    else:
        (coords, semantic_prediction_logits, semantic_labels, offset_predictions,
         offset_labels, instance_labels, backbone_feats, input_feats) = ensemble_named(
            coords, semantic_prediction_logits, semantic_labels, offset_predictions,
            offset_labels, instance_labels, backbone_feats, input_feats)
    _stage("ensemble")

    # hull for outer removal
    hull = None
    masks_inner_coords = None
    if config.shape_cfg.outer_remove:
        logger.info(f"{plot_name}: #################### prepare remove outer points ####################")
        hull = HullRaster(coords[:, :2], alpha=config.shape_cfg.alpha)
        at_edge = hull.within_boundary_buffer(coords[:, :2], config.shape_cfg.outer_remove)
        masks_inner_coords = ~at_edge

    # instances
    logger.info(f"{plot_name}: #################### getting predicted instances ####################")
    verticality = (None if (streaming and defer_features)
                   else input_feats[:, -1])
    instance_preds = get_instances(
        coords, offset_predictions, semantic_prediction_logits, config.grouping,
        verticality, TREE_CLASS_IN_DATASET, NON_TREES_LABEL_IN_GROUPING,
        NOT_ASSIGNED_LABEL_IN_GROUPING, START_NUM_PREDS,
        search_radius=config.sample_generation.search_radius_features)
    instance_preds_initial = np.copy(instance_preds)
    _stage("cluster")

    # assign remaining tree points by 5-NN on shifted coords
    tree_mask = instance_preds != NON_TREES_LABEL_IN_GROUPING
    if tree_mask.any():
        instance_preds[tree_mask] = assign_remaining_points_nearest_neighbor(
            (coords + offset_predictions)[tree_mask], instance_preds[tree_mask],
            NOT_ASSIGNED_LABEL_IN_GROUPING)
    _stage("assign_remaining")

    # save pointwise results
    if config.save_cfg.save_pointwise:
        pointwise_dir = osp.join(results_dir, "pointwise_results")
        os.makedirs(pointwise_dir, exist_ok=True)
        # uncompressed: deflate on ~10^7-row float arrays costs seconds per
        # plot and the dump is a scratch artifact (compress_pointwise: true
        # restores the small-file behavior)
        _savez = (np.savez_compressed
                  if config.save_cfg.get("compress_pointwise", False)
                  else np.savez)
        with substage("pointwise_npz", logger):
            _savez(
                osp.join(pointwise_dir, "pointwise_results.npz"),
                coords=coords, offset_predictions=offset_predictions,
                offset_labels=offset_labels,
                semantic_prediction_logits=semantic_prediction_logits,
                semantic_labels=semantic_labels, instance_labels=instance_labels,
                backbone_feats=backbone_feats, input_feats=input_feats,
                instance_preds=instance_preds,
                instance_preds_after_initial_clustering=instance_preds_initial,
                **({"masks_inner_coords": masks_inner_coords}
                   if masks_inner_coords is not None else {}),
            )
        shifted = coords + offset_predictions
        keep = instance_preds != NON_TREES_LABEL_IN_GROUPING
        with substage("cluster_coords_las", logger):
            save_data(np.hstack([shifted[keep], instance_preds[keep][:, None]]),
                      "las", "cluster_coords", pointwise_dir)
        _stage("save_pointwise")

    # remove outer points
    if config.shape_cfg.outer_remove:
        m = masks_inner_coords
        (coords, semantic_prediction_logits, semantic_labels, offset_predictions,
         offset_labels, instance_labels, instance_preds, input_feats) = (
            coords[m], semantic_prediction_logits[m], semantic_labels[m],
            offset_predictions[m], offset_labels[m], instance_labels[m],
            instance_preds[m], input_feats[m])
        if point_ids is not None:
            point_ids = point_ids[m]
        nt = instance_preds != NON_TREES_LABEL_IN_GROUPING
        if nt.any():
            instance_preds[nt], _ = make_labels_consecutive(instance_preds[nt], start_num=1)

    # edge-tree categorization for treewise saving.  Tree instances are the
    # labels > NON_TREES_LABEL: NOT_ASSIGNED (-1) points can persist when
    # clustering finds nothing to anchor the 5-NN assignment (degenerate
    # models) and must not index the per-tree tables.
    cluster_means_within_hull = insts_not_at_edge = None
    if config.save_cfg.save_treewise:
        nt = instance_preds > NON_TREES_LABEL_IN_GROUPING
        n_insts = int(instance_preds.max()) if nt.any() else 0
        cluster_means = (get_cluster_means(
            (coords + offset_predictions)[nt], instance_preds[nt])
            if nt.any() else np.zeros((0, 3)))
        hull_full = HullRaster(coords[:, :2], alpha=config.shape_cfg.alpha)
        cluster_means_within_hull = hull_full.contains(cluster_means[:, :2])
        at_edge_small = hull_full.within_boundary_buffer(
            coords[:, :2], config.shape_cfg.buffer_size_to_determine_edge_trees)
        preds_at_edge = np.unique(instance_preds[at_edge_small])
        preds_at_edge = preds_at_edge[preds_at_edge > NON_TREES_LABEL_IN_GROUPING]
        insts_not_at_edge = np.ones(n_insts, bool)
        insts_not_at_edge[preds_at_edge - 1] = False

    # propagate predictions to the requested cloud
    return_type = config.save_cfg.return_type
    if return_type == "original":
        logger.info(f"{plot_name}: propagating predictions to original points")
        # the centered original cloud and voxelized points are already in
        # memory (streaming path) — reloading their npz files cost 1-6 s of
        # host time per plot
        coords_to_return = centered_pts
        with substage("trace_load", logger):
            trace = np.load(osp.join(voxelized_dir, f"{plot_name}_centered_trace.npz"))
            trace_inverse = trace["inverse"]
        vox_xyz = (vox_pts.astype(np.float32) if streaming else load_data(
            osp.join(voxelized_dir, f"{plot_name}_centered.npz"))[:, :3])
        if point_ids is not None:
            # ids ARE voxel-cloud rows: the join is a pure scatter
            with substage("propagate_scatter", logger):
                vox_preds = np.full(len(vox_xyz), -1, np.int64)
                vox_preds[point_ids] = instance_preds
                not_found_vox = np.ones(len(vox_xyz), bool)
                not_found_vox[point_ids] = False
        else:
            with substage("propagate_by_key", logger):
                vox_preds, not_found_vox = propagate_by_key(
                    coords, instance_preds, vox_xyz)
        with substage("trace_inverse_gather", logger):
            preds_to_return = vox_preds[trace_inverse]
            not_yet_propagated = not_found_vox[trace_inverse]
    elif return_type == "voxelized":
        logger.info(f"{plot_name}: propagating predictions to voxelized points")
        coords_to_return = load_data(
            osp.join(voxelized_dir, f"{plot_name}_centered.npz"))[:, :3]
        if point_ids is not None:
            preds_to_return = np.full(len(coords_to_return), -1, np.int64)
            preds_to_return[point_ids] = instance_preds
            not_yet_propagated = np.ones(len(coords_to_return), bool)
            not_yet_propagated[point_ids] = False
        else:
            preds_to_return, not_yet_propagated = propagate_by_key(
                coords, instance_preds, coords_to_return)
    else:  # 'voxelized_and_filtered'
        coords_to_return = coords
        preds_to_return = instance_preds
        not_yet_propagated = np.zeros(len(coords), bool)

    if config.shape_cfg.outer_remove:
        within = HullRaster(coords[:, :2], alpha=config.shape_cfg.alpha)
        at_edge = within.within_boundary_buffer(coords_to_return[:, :2],
                                                config.shape_cfg.outer_remove)
        keep = ~at_edge
        coords_to_return = coords_to_return[keep]
        preds_to_return = np.asarray(preds_to_return)[keep]
        not_yet_propagated = not_yet_propagated[keep]

    if not_yet_propagated.any():
        with substage(f"propagate_5nn_leftovers({int(not_yet_propagated.sum())})",
                      logger):
            preds_to_return = np.asarray(preds_to_return)
            preds_to_return[not_yet_propagated] = propagate_preds(
                coords, instance_preds, coords_to_return[not_yet_propagated], 5)

    with substage("decenter_pack_f64", logger):
        # one fused pass: de-center (f32 + f64 mean upcasts) straight into
        # the (N, 4) output block — the separate astype + hstack cost two
        # extra 240 MB temporaries and ~3 s at 10M points on the 1-core host
        out = np.empty((len(coords_to_return), 4), np.float64)
        np.add(coords_to_return, xyz_mean, out=out[:, :3])
        out[:, 3] = np.asarray(preds_to_return)
        coords_to_return = out[:, :3]
    _stage("propagate")

    # save
    logger.info(f"{plot_name}: #################### Saving ####################")
    full_dir = osp.join(results_dir, "full_forest")
    os.makedirs(full_dir, exist_ok=True)
    for save_format in config.save_cfg.save_formats:
        with substage(f"save_data[{save_format}]", logger):
            save_data(out, save_format, plot_name, full_dir)
    if config.save_cfg.save_treewise:
        trees_dir = osp.join(results_dir, "individual_trees")
        os.makedirs(trees_dir, exist_ok=True)
        save_treewise(coords_to_return, np.asarray(preds_to_return),
                      cluster_means_within_hull, insts_not_at_edge, "las", trees_dir)

    _stage("save")
    elapsed = time.time() - t_start
    n_points = len(coords_to_return)
    n_trees = len(np.unique(preds_to_return)) - 1
    logger.info(f"{plot_name}: done in {elapsed:.1f}s — {n_points} pts, {n_trees} trees")
    return {
        "n_points": n_points,
        "n_trees": n_trees,
        "seconds": elapsed,
        "mpts_per_sec": n_points / max(elapsed, 1e-9) / 1e6,
        "results_dir": results_dir,
        "stage_seconds": stage_seconds,
        "model_timings": model_timings,
        "output_path": (osp.join(
            full_dir, f"{plot_name}.{config.save_cfg.save_formats[0]}")
            if config.save_cfg.save_formats else None),
    }
