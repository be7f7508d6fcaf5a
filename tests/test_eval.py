"""Evaluation protocol vs the reference's O(P*G*N) construction on small data."""

import numpy as np

from treelearn_tpu.eval import (
    contingency_matrices,
    detection_summary,
    evaluate_instance_segmentation,
    get_detection_failures,
    get_detections,
    get_segmentation_metrics,
)


def _reference_matrices(instance_labels, instance_preds, non_tree_label):
    """Direct port of the reference loop semantics as an oracle
    (eval.py:7-26)."""
    iou = np.zeros((instance_preds.max() + 1, instance_labels.max() + 1))
    prec = np.zeros_like(iou)
    rec = np.zeros_like(iou)
    for p in range(instance_preds.max() + 1):
        pmask = instance_preds == p
        gts = np.unique(instance_labels[pmask])
        gts = gts[gts != non_tree_label]
        for g in gts:
            gmask = instance_labels == g
            tp = (pmask & gmask).sum()
            fp = (pmask & ~gmask).sum()
            fn = (~pmask & gmask).sum()
            iou[p, g] = tp / (tp + fp + fn)
            prec[p, g] = tp / (tp + fp)
            rec[p, g] = tp / (tp + fn)
    return iou, prec, rec


def _random_labels(seed=0, n=5000, n_gt=10, n_pred=12):
    rng = np.random.default_rng(seed)
    gt = rng.integers(-1, n_gt, n)
    pred = np.where(rng.random(n) < 0.8,
                    np.clip(gt + rng.integers(0, 2, n), 0, n_pred - 1),
                    rng.integers(0, n_pred, n))
    pred[gt == -1] = rng.integers(0, n_pred, (gt == -1).sum())
    return gt, pred


def test_contingency_matches_reference_loop():
    gt, pred = _random_labels()
    iou, prec, rec = contingency_matrices(gt, pred, non_tree_label=-1)
    # the reference's -1 handling: non_tree_label=-1 means no column zeroing,
    # and -1 rows are excluded from matrices entirely
    ref_iou, ref_prec, ref_rec = _reference_matrices(
        gt[gt >= 0], pred[gt >= 0], non_tree_label=-1)
    # compare on the joint support: entries where both pred and gt >= 0 points
    # exist. Our matrices count fp/fn against -1 rows too, like the reference
    # (masks are computed over the full cloud there). Rebuild ours on same data:
    iou2, prec2, rec2 = contingency_matrices(gt, pred, non_tree_label=-1)
    # oracle on full arrays:
    ref_iou_full, ref_prec_full, ref_rec_full = _reference_matrices(
        gt, pred, non_tree_label=-1)
    np.testing.assert_allclose(iou2[: ref_iou_full.shape[0], : ref_iou_full.shape[1]],
                               ref_iou_full, atol=1e-12)
    np.testing.assert_allclose(prec2[: ref_prec_full.shape[0], : ref_prec_full.shape[1]],
                               ref_prec_full, atol=1e-12)
    np.testing.assert_allclose(rec2[: ref_rec_full.shape[0], : ref_rec_full.shape[1]],
                               ref_rec_full, atol=1e-12)


def test_perfect_predictions_give_perfect_scores():
    rng = np.random.default_rng(1)
    gt = rng.integers(-1, 8, 3000)
    pred = gt.copy()  # identical partition (labels -1..7; preds==gts)
    pred[gt == -1] = rng.integers(0, 8, (gt == -1).sum())  # noise points over -1
    # make preds over unlabeled small enough not to break matching
    matched_gts, matched_preds, iou, prec, rec = get_detections(gt, pred, 0.5, -1)
    assert len(matched_gts) == 8
    np.testing.assert_array_equal(np.sort(matched_gts), np.arange(8))
    for g, p in zip(matched_gts, matched_preds):
        assert g == p

    summary = detection_summary(matched_gts, [], matched_preds, [])
    assert summary["f1_score"] == 100.0
    assert summary["completeness"] == 100.0


def test_detection_failures_classification():
    # 3 gts; pred 0 matches gt 0; pred 1 covers gt1 (100 pts) and gt2 (60 pts)
    # -> iou(pred1, gt1) = 0.625 > 0.5 matched; gt2 unmatched, undersegmented
    gt = np.concatenate([np.zeros(100), np.ones(100), np.full(60, 2)]).astype(int)
    pred = np.concatenate([np.zeros(100), np.ones(160)]).astype(int)
    matched_gts, matched_preds, iou, prec, rec = get_detections(gt, pred, 0.5, -1)
    failures = get_detection_failures(
        matched_gts, matched_preds, np.arange(3), np.arange(2), iou, prec, rec,
        min_precision_for_pred=0.5, min_recall_for_gt=0.5)
    non_matched_gts, non_matched_preds, nmp_gt, nmg_pred, nmg_other = failures
    # pred 1 matched one of gt{1,2}; the other gt is unmatched with
    # corresponding pred 1 (undersegmentation) and the matched gt as other tree
    assert len(non_matched_gts) == 1
    assert nmg_pred[0] == 1
    assert not np.isnan(nmg_other[0])


def test_partition_eval_shapes():
    rng = np.random.default_rng(2)
    coords = rng.uniform(0, 10, (2000, 3))
    gt = rng.integers(0, 4, 2000)
    pred = gt.copy()
    intvls = [0, 0.5, 1]
    mapping = {i: i for i in range(4)}
    no_p, xy, z = evaluate_instance_segmentation(
        pred, gt, np.arange(4), np.arange(4), coords, mapping, mapping,
        intvls, intvls)
    assert len(no_p) == 4
    assert np.allclose(no_p["iou"], 1.0)
    assert xy.shape[1] == 2 + 3 * (len(intvls) - 1)
    assert z.shape[1] == 2 + 3 * (len(intvls) - 1)


def test_segmentation_metrics_nan_semantics():
    assert np.isnan(get_segmentation_metrics(0, 0, 0)[2])
    prec, rec, iou = get_segmentation_metrics(5, 0, 0)
    assert prec == 1.0 and rec == 1.0 and iou == 1.0
