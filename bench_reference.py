"""Reference-pipeline benchmark harness: apples-to-apples vs bench.py.

Runs the ORIGINAL TreeLearn pipeline (the reference implementation at
``TL_REFERENCE`` / /root/reference, unmodified) on the SAME synthetic forest
bench.py uses, so ``vs_baseline`` can be a measured number instead of the
Colab-T4 anchor derived in BASELINE.md.

The reference needs native third-party libraries this image does not ship
(spconv CUDA/CPU, Open3D, jakteristics, laspy, alphashape/geopandas —
SURVEY.md §2.2).  When they are missing, the script prints ONE JSON line with
``"available": false`` and the exact missing list, so a CI with the full
reference environment can run it and a bare one degrades gracefully.

Usage:  python bench_reference.py  [--trees 48 --ppt 16000 --ground 200000
                                    --extent 60]
Output: one JSON line {"metric", "value", "unit", "available", ...}.
"""

import argparse
import importlib
import json
import os
import sys
import tempfile
import time

REFERENCE = os.environ.get("TL_REFERENCE", "/root/reference")

# the import surface of the reference pipeline (SURVEY.md §2.2; reference
# setup/requirements.txt) — checked up front so the failure mode is one clear
# line, not a deep traceback
REQUIRED = ["torch", "spconv", "open3d", "jakteristics", "laspy", "munch",
            "timm", "sklearn", "scipy", "pandas", "yaml", "alphashape",
            "geopandas", "shapely"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", type=int, default=48)
    ap.add_argument("--ppt", type=int, default=16000)
    ap.add_argument("--ground", type=int, default=200000)
    ap.add_argument("--extent", type=float, default=60.0)
    args = ap.parse_args()

    missing = []
    for mod in REQUIRED:
        try:
            importlib.import_module(mod)
        except Exception:
            missing.append(mod)

    base = {
        "metric": "reference pipeline on bench.py's synthetic forest",
        "unit": "Mpts/sec",
        "reference": REFERENCE,
    }
    if missing or not os.path.isdir(REFERENCE):
        print(json.dumps({
            **base, "available": False, "value": None,
            "missing_modules": missing,
            "note": "install the reference requirements (reference "
                    "setup/requirements.txt) and re-run for a measured "
                    "baseline; bench.py meanwhile uses the Colab-T4 anchor "
                    "(BASELINE.md)",
        }))
        return

    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from treelearn_tpu.data.synthetic import make_synthetic_forest

    data, _ = make_synthetic_forest(
        n_trees=args.trees, extent=args.extent, points_per_tree=args.ppt,
        ground_points=args.ground, seed=0)

    work = tempfile.mkdtemp(prefix="bench_reference_")
    forest_dir = os.path.join(work, "plot", "forest")
    os.makedirs(forest_dir)
    forest_path = os.path.join(forest_dir, "bench_forest.npy")
    np.save(forest_path, data[:, :4].astype(np.float64))

    from munch import Munch

    sys.path.insert(0, os.path.join(REFERENCE, "tools", "pipeline"))
    from pipeline import run_treelearn_pipeline  # reference entry point
    from tree_learn.util import get_config

    config = get_config(os.path.join(REFERENCE, "configs", "pipeline",
                                     "pipeline.yaml"))
    config.forest_path = forest_path
    config.dataset_test.data_root = os.path.join(work, "plot", "tiles")
    config.tile_generation = True
    config.pretrain = os.environ.get("TL_REFERENCE_WEIGHTS", "")
    config.shape_cfg.outer_remove = False
    config.save_cfg = Munch({
        "save_formats": ["npy"], "save_treewise": False,
        "save_pointwise": True, "return_type": "original"})

    t0 = time.time()
    run_treelearn_pipeline(config)
    elapsed = time.time() - t0
    mpts = len(data) / elapsed / 1e6
    print(json.dumps({
        **base, "available": True, "value": round(mpts, 4),
        "seconds": round(elapsed, 1), "n_points": len(data),
    }))


if __name__ == "__main__":
    main()
