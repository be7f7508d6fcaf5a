"""End-to-end integration: full pipeline on a synthetic mini-forest, and a
short training run that reduces loss.  Small shapes only (CI on CPU)."""

import os
import os.path as osp

import numpy as np
import pytest

from treelearn_tpu.config import ConfigDict
from treelearn_tpu.data.synthetic import make_synthetic_forest


def _pipeline_config(forest_path, voxel_capacity=1 << 14):
    return ConfigDict.from_dict({
        "forest_path": forest_path,
        "pretrain": None,
        "fp16": False,
        "tile_generation": True,
        "voxel_capacity": voxel_capacity,
        "model": {
            "kernel_size": 3, "channels": 8, "num_blocks": 3,
            "use_feats": False, "use_coords": False, "dim_coord": 3,
            "dim_feat": 1, "max_num_points_per_voxel": 3, "fixed_modules": [],
            "spatial_shape": [500, 500, 1000], "voxel_size": 0.1,
        },
        "sample_generation": {
            "voxel_size": 0.1, "search_radius_features": 0.6,
            "inner_edge": 12, "outer_edge": 6, "stride": 1,
            "sample_generator": {"n_neigh_sor": None, "multiplier_sor": None,
                                 "rad": None, "npoints_rad": None},
        },
        "grouping": {
            "tree_conf_thresh": 0.5, "tau_vert": 0.6, "tau_off": 4,
            "tau_group": 0.15, "tau_min": 50, "use_hdbscan": False,
        },
        "dataloader": {"batch_size": 1, "num_workers": 0},
        "dataset_test": {"training": False, "data_root": "",
                         "inner_square_edge_length": 12},
        "shape_cfg": {"outer_remove": None, "alpha": 0.6,
                      "buffer_size_to_determine_edge_trees": 0.3},
        "save_cfg": {"save_formats": ["las"], "save_treewise": True,
                     "save_pointwise": True, "return_type": "original",
                     "results_dir": "results"},
    })


@pytest.mark.slow
@pytest.mark.parametrize("whole_plot", [True, False],
                         ids=["whole_plot", "tiled"])
def test_full_pipeline_on_synthetic_forest(tmp_path, whole_plot):
    from treelearn_tpu.io import load_data
    from treelearn_tpu.pipeline import run_treelearn_pipeline

    data, _ = make_synthetic_forest(n_trees=6, extent=20, points_per_tree=800,
                                    ground_points=4000, seed=3)
    forest_dir = tmp_path / "plot" / "forest"
    os.makedirs(forest_dir)
    forest_path = str(forest_dir / "mini.npz")
    np.savez(forest_path, points=data[:, :3].astype(np.float32),
             labels=data[:, 3])

    config = _pipeline_config(forest_path)
    config.whole_plot = whole_plot
    result = run_treelearn_pipeline(config)

    assert osp.exists(result["output_path"])
    out = load_data(result["output_path"])
    # one output row per original input point (return_type 'original')
    assert len(out) == len(data)
    # pointwise artifacts exist
    assert osp.exists(osp.join(result["results_dir"], "pointwise_results",
                               "pointwise_results.npz"))
    # coordinates round-trip (de-centering restored; mm LAS quantization)
    np.testing.assert_allclose(np.sort(out[:, 0]), np.sort(data[:, 0]), atol=5e-3)


@pytest.mark.slow
def test_training_reduces_loss(tmp_path):
    import jax
    import jax.numpy as jnp

    from treelearn_tpu.data import TreeDataset, TreeLoader
    from treelearn_tpu.data.synthetic import make_crop_npz, verticality_proxy
    from treelearn_tpu.model import TreeLearn
    from treelearn_tpu.train.loop import build_optimizer, make_train_step

    crops_dir = tmp_path / "crops"
    os.makedirs(crops_dir)
    for i in range(4):
        data, _ = make_synthetic_forest(n_trees=3, extent=10,
                                        points_per_tree=400,
                                        ground_points=1500, seed=i)
        data[:, :2] -= 5.0  # crops are centered
        make_crop_npz(str(crops_dir / f"crop_{i}.npz"), data,
                      verticality_proxy(data))

    dataset = TreeDataset(str(crops_dir), inner_square_edge_length=8,
                          training=True,
                          data_augmentations={"jitter": False, "flip": True,
                                              "rot": True, "scaled": False,
                                              "point_jitter": False})
    loader = TreeLoader(dataset, batch_size=2, training=True, min_bucket=1 << 13)

    model = TreeLearn(channels=8, num_blocks=2, spatial_shape=[128, 128, 256],
                      voxel_size=0.1)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = build_optimizer({"type": "AdamW", "lr": 3e-3,
                                 "weight_decay": 1e-3}, grad_norm_clip=True)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, batch_size=2,
                           voxel_capacity=1 << 13,
                           compute_dtype=jnp.float32)

    losses = []
    for epoch in range(8):
        for batch in loader:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            params, state, opt_state, loss, _ = step(params, state, opt_state,
                                                     jbatch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.95, losses
