"""Resumable self-training (train/selftrain.py, VERDICT r4 item 1a).

The bench's checkpoint must be impossible to lose to a timeout: a budget-
stopped run saves a usable partial (params + optimizer moments + step count),
a rerun resumes from it instead of restarting, and the finished artifact is
cached by recipe fingerprint.  Tiny recipe on the CPU backend.
"""

import os

import numpy as np
import pytest

from treelearn_tpu.train.selftrain import (BENCH_RECIPE, _recipe_key,
                                           train_synthetic_checkpoint)

TINY_MODEL = {"voxel_size": 0.5, "use_coords": False, "use_feats": False,
              "channels": 4, "num_blocks": 2}
TINY_RECIPE = dict(steps=4, n_crops=2, crop_extent=8.0, ppt=400, lr=1e-3,
                   voxel_capacity=1 << 12, hard_frac=0.5, save_every=2)


def test_budget_stop_then_resume_then_cache(tmp_path):
    cache = str(tmp_path)

    # 1. budget exhausted immediately: at least one step runs, a partial is
    # saved and returned with complete=False
    path1, info1 = train_synthetic_checkpoint(
        dict(TINY_MODEL), cache_dir=cache, max_seconds=0.0,
        return_info=True, **TINY_RECIPE)
    assert not info1["complete"]
    assert 1 <= info1["completed_steps"] < info1["target_steps"]
    assert path1.endswith("_partial.npz") and os.path.isfile(path1)

    # 2. rerun with no budget limit: resumes (completed_steps monotone) and
    # finishes; the final artifact replaces the partial
    path2, info2 = train_synthetic_checkpoint(
        dict(TINY_MODEL), cache_dir=cache, return_info=True, **TINY_RECIPE)
    assert info2["complete"] and not info2["cached"]
    assert info2["completed_steps"] == TINY_RECIPE["steps"]
    assert not path2.endswith("_partial.npz") and os.path.isfile(path2)
    assert not os.path.isfile(path1)  # partial removed on completion

    # 3. third call is a pure cache hit
    path3, info3 = train_synthetic_checkpoint(
        dict(TINY_MODEL), cache_dir=cache, return_info=True, **TINY_RECIPE)
    assert path3 == path2 and info3["cached"]

    # the partial carries optimizer moments: resumability means the final
    # params exist and load as a checkpoint
    from treelearn_tpu.model.checkpoint import load_native_checkpoint

    params, state, opt_flat, epoch = load_native_checkpoint(path2)
    assert params and state


def test_corrupt_partial_restarts(tmp_path):
    cache = str(tmp_path)
    path1, _ = train_synthetic_checkpoint(
        dict(TINY_MODEL), cache_dir=cache, max_seconds=0.0,
        return_info=True, **TINY_RECIPE)
    with open(path1, "wb") as f:
        f.write(b"truncated garbage")
    path2, info2 = train_synthetic_checkpoint(
        dict(TINY_MODEL), cache_dir=cache, return_info=True, **TINY_RECIPE)
    assert info2["complete"] and os.path.isfile(path2)


def test_bench_recipe_fingerprint_pinned():
    """The shared BENCH_RECIPE (ADVICE r4) must keep resolving to the trained
    checkpoint key 8cd77a7b359951b3 — a silent drift would cold-retrain ~45
    minutes inside the driver budget (the round-4 failure)."""
    from treelearn_tpu.config import get_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_config(os.path.join(repo, "configs", "pipeline",
                                  "pipeline.yaml"))
    mc = dict(cfg.model)
    side = int(np.ceil((BENCH_RECIPE["crop_extent"] + 4) / 0.1 / 64)) * 64
    mc["spatial_shape"] = [side, side, 256]
    recipe = {"steps": BENCH_RECIPE["steps"], "lr": BENCH_RECIPE["lr"],
              "batch_size": 1, "voxel_capacity": 1 << 17,
              "n_crops": BENCH_RECIPE["n_crops"],
              "crop_extent": BENCH_RECIPE["crop_extent"], "seed0": 101,
              "v": 7, "hard_frac": BENCH_RECIPE["hard_frac"],
              "ppt": BENCH_RECIPE["ppt"]}
    assert _recipe_key(mc, recipe) == "8cd77a7b359951b3"
