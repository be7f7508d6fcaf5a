"""End-to-end segmentation benchmark.

Runs the full pipeline (voxelize -> tile -> sparse U-Net inference -> ensemble
-> cluster -> propagate -> save) on a procedurally generated forest on the
real device and reports throughput in Mpts/sec over raw input points.

Baseline derivation (see BASELINE.md): the reference publishes no Mpts/sec
figure.  Its only runtime anchor is the Colab demo — the ~1600 m^2
``plot_7_cut.laz`` (MLS, ~8.3M points at typical >5k pts/m^2 densities) in
~12-15 min on a T4, i.e. ~0.010 Mpts/sec end to end.  We use 0.010 Mpts/sec as
``vs_baseline`` denominator; the L1W/A100 number must be measured once data and
an A100 are available.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

BASELINE_MPTS_PER_SEC = 0.010


def main():
    import jax

    from treelearn_tpu.config import ConfigDict, get_config
    from treelearn_tpu.data.synthetic import make_synthetic_forest
    from treelearn_tpu.pipeline import run_treelearn_pipeline

    work = os.path.abspath("bench_workdir")
    shutil.rmtree(work, ignore_errors=True)
    forest_dir = os.path.join(work, "plot", "forest")
    os.makedirs(forest_dir, exist_ok=True)

    n_trees = int(os.environ.get("BENCH_TREES", 120))
    points_per_tree = int(os.environ.get("BENCH_PPT", 20000))
    ground = int(os.environ.get("BENCH_GROUND", 600000))
    extent = float(os.environ.get("BENCH_EXTENT", 60.0))
    data, _ = make_synthetic_forest(
        n_trees=n_trees, extent=extent, points_per_tree=points_per_tree,
        ground_points=ground, seed=0)
    n_points = len(data)
    forest_path = os.path.join(forest_dir, "bench_forest.npz")
    np.savez_compressed(forest_path, points=data[:, :3].astype(np.float32),
                        labels=data[:, 3])

    config = get_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "configs", "pipeline", "pipeline.yaml"))
    config.forest_path = forest_path
    config.pretrain = None            # random weights: timing-equivalent
    config.tile_generation = True
    config.grouping.use_hdbscan = False  # on-device grouping path
    config.save_cfg = ConfigDict.from_dict({
        "save_formats": ["las"], "save_treewise": False,
        "save_pointwise": False, "return_type": "original",
        "results_dir": "results",
    })
    config.shape_cfg.outer_remove = None
    config.voxel_capacity = 1 << 19
    config.dataloader.batch_size = 1

    t0 = time.time()
    result = run_treelearn_pipeline(config)
    elapsed = time.time() - t0

    mpts = n_points / elapsed / 1e6
    print(json.dumps({
        "metric": "synthetic forest end-to-end segmentation",
        "value": round(mpts, 4),
        "unit": "Mpts/sec",
        "vs_baseline": round(mpts / BASELINE_MPTS_PER_SEC, 2),
        "n_points": n_points,
        "seconds": round(elapsed, 1),
        "n_trees_found": result["n_trees"],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
