"""Benchmark evaluation CLI:
python tools/evaluate.py --config configs/evaluation/evaluate.yaml

Parity: reference tools/evaluation/evaluate.py — load gt + predicted clouds,
propagate predictions onto gt coordinates (5-NN majority), Hungarian matching,
detection failure analysis, partitioned segmentation metrics, aggregate scores.
"""

import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

NON_TREE_LABEL = 0


def evaluate(config, config_path=None):
    from treelearn_tpu.eval import (
        detection_summary,
        evaluate_instance_segmentation,
        get_detection_failures,
        get_detections,
    )
    from treelearn_tpu.io import load_data, save_data
    from treelearn_tpu.logging_utils import get_root_logger
    from treelearn_tpu.pipeline import make_labels_consecutive, propagate_preds

    base_dir = (config.get("work_dir")
                or osp.join(osp.dirname(config.paths.pred_forest_path),
                            "evaluation"))
    documentation_dir = osp.join(base_dir, "documentation")
    os.makedirs(documentation_dir, exist_ok=True)
    logger = get_root_logger(osp.join(documentation_dir, "evaluate_log.txt"))

    # ground truth
    gt = load_data(config.paths.gt_forest_path)
    gt_coords = gt[:, :3]
    gt_labels = gt[:, 3].astype(int)
    gt_labels[gt_labels == NON_TREE_LABEL] = -1
    tree_mask = gt_labels != -1
    gt_labels[tree_mask], mapping_gt = make_labels_consecutive(
        gt_labels[tree_mask], start_num=0)
    mapping_gt[-1] = NON_TREE_LABEL

    # predictions, propagated onto gt coordinates
    pred = load_data(config.paths.pred_forest_path)
    logger.info("propagating predictions to coords of ground truth...")
    instance_preds = propagate_preds(pred[:, :3], pred[:, 3].astype(int),
                                     gt_coords, 5)
    instance_preds[instance_preds == NON_TREE_LABEL] = -1
    tree_mask = instance_preds != -1
    instance_preds[tree_mask], mapping_pred = make_labels_consecutive(
        instance_preds[tree_mask], start_num=0)
    mapping_pred[-1] = NON_TREE_LABEL

    # detection
    logger.info("getting detection results...")
    matched_gts, matched_preds, iou, precision, recall = get_detections(
        gt_labels, instance_preds, config.thresholds.min_iou_for_match, -1)
    unique_labels = np.arange(gt_labels.max() + 1)
    unique_preds_all = np.arange(instance_preds.max() + 1)
    failures = get_detection_failures(
        matched_gts, matched_preds, unique_labels, unique_preds_all, iou,
        precision, recall, config.thresholds.min_precision_for_pred,
        config.thresholds.min_recall_for_gt)
    (non_matched_gts, non_matched_preds, nmp_gt, nmg_pred, nmg_other) = failures

    # segmentation (coverage-style: per gt, the argmax-iou pred)
    logger.info("getting segmentation results...")
    unique_gts = np.arange(iou.shape[1])
    unique_preds = iou.argmax(axis=0)
    no_partition, xy_partition, z_partition = evaluate_instance_segmentation(
        instance_preds, gt_labels, unique_gts, unique_preds, gt_coords,
        mapping_gt, mapping_pred, config.partitions.xy_partition,
        config.partitions.z_partition)

    nmp_filtered = np.array([p for p, g in zip(non_matched_preds, nmp_gt)
                             if not np.isnan(g)])
    summary = detection_summary(matched_gts, non_matched_gts, matched_preds,
                                nmp_filtered)
    seg = no_partition[["prec", "rec", "iou"]].mean(0) * 100

    logger.info("\n===== Results detection evaluation =====")
    logger.info(f"Completeness: {summary['completeness']}%")
    logger.info(f"Omission Error Rate: {summary['omission_error_rate']}%")
    logger.info(f"Commission Error Rate: {summary['commission_error_rate']}%")
    logger.info(f"F1 Score: {summary['f1_score']}%")
    logger.info("\n===== Results segmentation evaluation =====")
    logger.info(f"Precision: {round(seg['prec'], 1)}%")
    logger.info(f"Recall: {round(seg['rec'], 1)}%")
    logger.info(f"Coverage: {round(seg['iou'], 1)}%")

    # predictions on gt cloud for analysis
    preds_original = np.array([mapping_pred[p] for p in instance_preds])
    save_data(np.hstack([gt_coords, preds_original[:, None]]), "las",
              "pred_forest_propagated_to_gt_pointcloud", base_dir)

    # failure correspondences in ORIGINAL label space (what the evaluation
    # notebook browses; key names per reference evaluate.py:122-138):
    # commission errors = non-matched preds whose best gt passed the precision
    # gate, paired with that gt; omission errors = non-matched gts paired with
    # the undersegmenting pred and the gt tree that pred was matched to
    def _map_or_nan(mapping, values):
        return np.array([np.nan if (isinstance(v, float) and np.isnan(v))
                         else mapping[int(v)] for v in values], dtype=float)

    nmp_pairs = [(p, g) for p, g in zip(non_matched_preds, nmp_gt)
                 if not np.isnan(g)]
    results = {
        "detection_results": {
            **summary,
            "matched_gts": np.array([mapping_gt[g] for g in matched_gts]),
            "matched_preds": np.array([mapping_pred[p] for p in matched_preds]),
            "non_matched_gts": np.array([mapping_gt[g] for g in non_matched_gts]),
            "non_matched_preds": np.array([mapping_pred[p] for p in non_matched_preds]),
            "non_matched_preds_filtered": np.array(
                [mapping_pred[p] for p, _ in nmp_pairs], dtype=float),
            "non_matched_preds_corresponding_gt_filtered": np.array(
                [mapping_gt[int(g)] for _, g in nmp_pairs], dtype=float),
            "non_matched_gts_corresponding_pred": _map_or_nan(
                mapping_pred, nmg_pred),
            "non_matched_gts_corresponding_other_tree": _map_or_nan(
                mapping_gt, nmg_other),
        },
        "segmentation_results": {
            "precision": round(seg["prec"], 1),
            "recall": round(seg["rec"], 1),
            "iou": round(seg["iou"], 1),
            "no_partition": no_partition,
            "xy_partition": xy_partition,
            "z_partition": z_partition,
        },
    }
    with open(osp.join(base_dir, "evaluation_results.pkl"), "wb") as f:
        pickle.dump(results, f)
    return results


if __name__ == "__main__":
    from treelearn_tpu.config import get_config

    # same flag set as every other tool (reference parser.py:6-16);
    # --work_dir overrides where evaluation artifacts land
    parser = argparse.ArgumentParser("treelearn_tpu evaluate")
    parser.add_argument("--config", type=str, help="path to evaluation config")
    parser.add_argument("--work_dir", type=str, default=None,
                        help="output directory (default: alongside the "
                             "predicted cloud)")
    args = parser.parse_args()
    cfg = get_config(args.config)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    evaluate(cfg, args.config)
