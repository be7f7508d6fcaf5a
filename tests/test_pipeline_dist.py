"""Sharded pipeline end-to-end on a virtual CPU mesh (VERDICT r3 item 9).

Runs the FULL pipeline (tile -> DP inference over the 8-device mesh ->
ensemble -> cluster -> assign -> propagate -> save) with ``dist: true`` and
asserts the outputs are identical to the single-device run: data-parallel
tile inference is a pure reorganization of the same per-tile programs
(parallel/mesh.py:make_dp_inference_step), so every downstream stage sees
bit-identical inputs.
"""

import os
import os.path as osp

import numpy as np
import pytest

import jax

from tests.test_integration import _pipeline_config
from treelearn_tpu.data.synthetic import make_synthetic_forest


@pytest.mark.slow
def test_dist_pipeline_matches_single_device(tmp_path):
    from treelearn_tpu.pipeline import run_treelearn_pipeline

    assert len(jax.devices()) >= 8  # conftest forces the 8-device CPU mesh

    data, _ = make_synthetic_forest(n_trees=6, extent=20, points_per_tree=800,
                                    ground_points=4000, seed=3)

    results = {}
    for dist in (False, True):
        plot = tmp_path / ("dist" if dist else "single") / "plot" / "forest"
        os.makedirs(plot)
        forest_path = str(plot / "mini.npz")
        np.savez(forest_path, points=data[:, :3].astype(np.float32),
                 labels=data[:, 3])
        config = _pipeline_config(forest_path)
        config.whole_plot = False  # tiled: several batches stream the mesh
        config.dist = dist
        res = run_treelearn_pipeline(config)
        pw = np.load(osp.join(res["results_dir"], "pointwise_results",
                              "pointwise_results.npz"))
        results[dist] = (res, {k: pw[k] for k in pw.files})

    a, b = results[False][1], results[True][1]
    assert set(a) == set(b)
    # inference outputs and every derived stage must agree exactly
    np.testing.assert_array_equal(a["coords"], b["coords"])
    np.testing.assert_allclose(a["semantic_prediction_logits"],
                               b["semantic_prediction_logits"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(a["offset_predictions"],
                               b["offset_predictions"], rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(a["instance_preds"], b["instance_preds"])
    assert results[False][0]["n_trees"] == results[True][0]["n_trees"]
