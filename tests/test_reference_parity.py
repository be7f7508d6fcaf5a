"""Differential tests against the reference source itself.

The reference at /root/reference is the ground-truth oracle wherever it can
run in this env:

* tree_learn/util/eval.py imports only numpy/pandas/scipy — imported whole.
* The ``ensemble`` function (util/pipeline.py:113-141) needs only
  numpy/pandas — AST-extracted from its module (whose other imports are
  unavailable here) and exec'd against a minimal namespace.
* ``get_config``/``modify_default_cfg`` (util/parser.py:23-60) need yaml +
  munch — extracted the same way with a dict-based Munch shim.

Each test feeds randomized inputs through both implementations and asserts
equality.  (The reference code is treated purely as data/oracle here.)
"""

import ast
import importlib.util
import os.path as osp
import textwrap

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference/tree_learn/util"

pytestmark = pytest.mark.skipif(not osp.isdir(REF),
                                reason="reference checkout not present")


def _load_ref_eval():
    spec = importlib.util.spec_from_file_location("ref_eval",
                                                  osp.join(REF, "eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _extract_functions(path, names, namespace):
    """Exec only the named top-level functions of a module whose other
    imports are unavailable in this env."""
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in names]
    assert len(keep) == len(names), (names, [n.name for n in keep])
    code = "\n\n".join(ast.get_source_segment(open(path).read(), n)
                       for n in keep)
    ns = dict(namespace)
    exec(textwrap.dedent(code), ns)
    return ns


def _random_segmentation(n=4000, n_gt=8, n_pred=9, seed=0):
    """Correlated gt/pred instance labelings with -1 noise, split/merge
    errors — nontrivial IoU structure."""
    rng = np.random.default_rng(seed)
    gt = rng.integers(-1, n_gt, n)
    pred = gt.copy()
    # random relabel map with one merge and one split
    remap = rng.permutation(n_pred)[:n_gt]
    pred = np.where(pred >= 0, remap[np.clip(pred, 0, None)], -1)
    flip = rng.random(n) < 0.15
    pred[flip] = rng.integers(-1, n_pred, flip.sum())
    coords = rng.normal(size=(n, 3)) * [3, 3, 6] + [0, 0, 8]
    return gt, pred, coords


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_get_detections_matches_reference(seed):
    from treelearn_tpu.eval.evaluation import get_detections

    ref = _load_ref_eval()
    gt, pred, _ = _random_segmentation(seed=seed)

    r_gts, r_preds, r_iou, r_prec, r_rec = ref.get_detections(
        gt, pred, min_iou_match=0.3, non_tree_label=-1)
    o_gts, o_preds, o_iou, o_prec, o_rec = get_detections(
        gt, pred, min_iou_match=0.3, non_tree_label=-1)

    np.testing.assert_allclose(o_iou, r_iou)
    np.testing.assert_allclose(o_prec, r_prec)
    np.testing.assert_allclose(o_rec, r_rec)
    # hungarian ties can permute pairs; compare as sets of (gt, pred)
    assert set(zip(o_gts.tolist(), o_preds.tolist())) == \
        set(zip(r_gts.tolist(), r_preds.tolist()))


def test_get_detection_failures_matches_reference():
    from treelearn_tpu.eval.evaluation import get_detection_failures, get_detections

    ref = _load_ref_eval()
    gt, pred, _ = _random_segmentation(seed=3)
    m_gts, m_preds, iou, prec, rec = get_detections(gt, pred, 0.5, -1)
    uniq_gt = np.unique(gt[gt >= 0])
    uniq_pred = np.unique(pred[pred >= 0])

    r = ref.get_detection_failures(m_gts, m_preds, uniq_gt, uniq_pred,
                                   iou, prec, rec, 0.5, 0.5)
    o = get_detection_failures(m_gts, m_preds, uniq_gt, uniq_pred,
                               iou, prec, rec, 0.5, 0.5)
    # reference builds non-matched sets via python set() (unordered);
    # compare order-independently, pairing each id with its analysis columns
    def rows(res, i_ids, i_cols):
        return sorted(
            (int(res[i_ids][j],),) + tuple(
                "nan" if np.isnan(res[c][j]) else float(res[c][j])
                for c in i_cols)
            for j in range(len(res[i_ids])))

    assert rows(o, 0, (3, 4)) == rows(r, 0, (3, 4))   # gts + their analysis
    assert rows(o, 1, (2,)) == rows(r, 1, (2,))       # preds + commission gt


def test_instance_segmentation_eval_matches_reference():
    from treelearn_tpu.eval.evaluation import evaluate_instance_segmentation

    ref = _load_ref_eval()
    gt, pred, coords = _random_segmentation(seed=4)
    uniq_gt = np.unique(gt[gt >= 0])[:5]
    uniq_pred = np.unique(pred[pred >= 0])[:5]
    mapping_gt = {g: 100 + g for g in uniq_gt}
    mapping_pred = {p: 200 + p for p in uniq_pred}
    intvls = np.linspace(0, 1, 11).tolist()

    r_no, r_xy, r_z = ref.evaluate_instance_segmentation(
        pred, gt, uniq_gt, uniq_pred, coords, mapping_gt, mapping_pred,
        intvls, intvls)
    o_no, o_xy, o_z = evaluate_instance_segmentation(
        pred, gt, uniq_gt, uniq_pred, coords, mapping_gt, mapping_pred,
        intvls, intvls)

    for ours, want in ((o_no, r_no), (o_xy, r_xy), (o_z, r_z)):
        assert list(ours.columns) == list(want.columns)
        pd.testing.assert_frame_equal(ours.astype(np.float64),
                                      want.astype(np.float64),
                                      check_dtype=False, atol=1e-12)


def test_ensemble_matches_reference_pandas_groupby():
    from treelearn_tpu.pipeline.ensemble import ensemble_named

    ns = _extract_functions(osp.join(REF, "pipeline.py"), ["ensemble"],
                            {"np": np, "pd": pd})
    rng = np.random.default_rng(5)
    n = 3000
    # duplicate coordinates across "tiles" with jitter below rounding
    base = rng.uniform(0, 5, (n // 3, 3)).round(2)
    coords = np.concatenate([base, base, base[: n - 2 * (n // 3)]])
    coords = coords + rng.uniform(-4e-4, 4e-4, coords.shape)
    sem = rng.normal(size=(n, 2))
    sem_lab = rng.integers(0, 2, n)
    off_pred = rng.normal(size=(n, 3))
    off_lab = rng.normal(size=(n, 3))
    inst = rng.integers(-1, 5, n)
    feats = rng.normal(size=(n, 4))
    in_feats = rng.normal(size=(n, 1))

    r = ns["ensemble"](coords, sem, sem_lab, off_pred, off_lab, inst,
                       feats, in_feats)
    o = ensemble_named(coords, sem, sem_lab, off_pred, off_lab, inst,
                       feats, in_feats)

    # group order differs (lex sort vs key sort); align by rounded coords
    def order(c):
        return np.lexsort((c[:, 2], c[:, 1], c[:, 0]))

    ro, oo = order(r[0]), order(o[0])
    assert len(r[0]) == len(o[0])
    for i in range(8):
        np.testing.assert_allclose(np.asarray(o[i])[oo],
                                   np.asarray(r[i])[ro],
                                   rtol=1e-5, atol=1e-5, err_msg=f"output {i}")


def test_get_config_matches_reference_merge_semantics(tmp_path):
    from treelearn_tpu.config import get_config

    class Munch(dict):
        """Dict shim for the munch package (attribute-access dict)."""

        @classmethod
        def fromDict(cls, d):
            if isinstance(d, dict):
                return cls({k: cls.fromDict(v) for k, v in d.items()})
            if isinstance(d, list):
                return [cls.fromDict(x) for x in d]
            return d

        def __getattr__(self, k):
            return self[k]

    import yaml

    ns = _extract_functions(
        osp.join(REF, "parser.py"),
        ["load_yaml_file", "get_config", "modify_default_cfg"],
        {"yaml": yaml, "Munch": Munch})

    (tmp_path / "model.yaml").write_text(
        "model:\n  channels: 32\n  num_blocks: 7\n  sub:\n    a: 1\n    b: 2\n")
    (tmp_path / "grouping.yaml").write_text(
        "grouping:\n  tau_min: 50\n  use_hdbscan: true\n")
    (tmp_path / "main.yaml").write_text(
        f"default_args: ['{tmp_path}/model.yaml', '{tmp_path}/grouping.yaml']\n"
        "model:\n  num_blocks: 3\n  sub:\n    b: 99\n    c: 7\n"
        "grouping:\n  tau_min: 10\n"
        "epochs: 5\n")

    def plain(d):
        if isinstance(d, dict):
            return {k: plain(v) for k, v in d.items()}
        if isinstance(d, list):
            return [plain(x) for x in d]
        return d

    want = plain(ns["get_config"](str(tmp_path / "main.yaml")))
    got = plain(get_config(str(tmp_path / "main.yaml")))
    assert got == want
    # the override semantics worth pinning: nested keys merge, siblings survive
    assert want["model"]["sub"] == {"a": 1, "b": 99, "c": 7}
    assert want["model"]["channels"] == 32 and want["model"]["num_blocks"] == 3
