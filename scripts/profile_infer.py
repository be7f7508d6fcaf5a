"""Attribute the whole-plot inference stage wall time on real TPU.

Replicates run.py's streaming whole-plot path against the bench workdir
artifacts, timing: vox load, TileStream init, batch cut, H2D, dispatch,
pure step, harvest.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from treelearn_tpu.model import TreeLearn
from treelearn_tpu.pipeline.streaming import TileStream
from treelearn_tpu.pipeline.inference import get_pointwise_preds, _MODEL_INPUT_KEYS

WORK = "/root/repo/bench_workdir/plot"


def main():
    t0 = time.time()
    vox = np.load(os.path.join(WORK, "forest_voxelized0.1",
                               "bench_forest_centered.npz"))
    vox_pts = vox["points"].astype(np.float64)
    labels = vox["labels"]
    print(f"vox load: {time.time()-t0:.2f}s ({len(vox_pts)} voxels)")

    t0 = time.time()
    stream = TileStream(vox_pts, labels,
                        np.zeros((len(vox_pts), 1), np.float32),
                        8.0, 13.5, 0.5)
    print(f"TileStream init: {time.time()-t0:.2f}s")

    cap = 1 << int(np.ceil(np.log2(len(vox_pts))))
    t0 = time.time()
    batches = list(stream.whole_plot_batches(min_bucket=cap))
    print(f"whole_plot_batches cut: {time.time()-t0:.2f}s ({len(batches)} batch)")

    batch = batches[0]
    t0 = time.time()
    jbatch = {k: jax.device_put(np.asarray(batch[k])) for k in _MODEL_INPUT_KEYS}
    jax.block_until_ready(jbatch)
    print(f"H2D: {time.time()-t0:.2f}s "
          f"({sum(np.asarray(batch[k]).nbytes for k in _MODEL_INPUT_KEYS)/1e6:.1f} MB)")

    ext = vox_pts.max(axis=0) - vox_pts.min(axis=0)
    ss = [int(np.ceil((np.ceil(e / 0.1) + 2) / 64)) * 64 for e in ext]
    model = TreeLearn(channels=32, num_blocks=7, kernel_size=3, dim_coord=3,
                      dim_feat=1, use_coords=False, use_feats=False,
                      spatial_shape=ss, voxel_size=0.1)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)

    from treelearn_tpu.train.loop import make_eval_step

    inner = int((np.asarray(batch["masks_inner"]) & np.asarray(batch["valid"])).sum())
    inner_cap = min(1 << int(np.ceil(np.log2(max(inner, cap // 8)))), cap)
    step = make_eval_step(model, batch_size=1, voxel_capacity=cap,
                          compute_dtype=jnp.bfloat16, inner_capacity=inner_cap,
                          need_backbone=False)
    t0 = time.time()
    out = step(params, state, jbatch)
    jax.block_until_ready(out)
    print(f"first step (compile or cache load): {time.time()-t0:.2f}s")

    for i in range(2):
        jb2 = dict(jbatch)
        jb2["coords"] = jbatch["coords"] + np.float32(1e-4 * (i + 1))
        t0 = time.time()
        out = step(params, state, jb2)
        jax.block_until_ready(out)
        print(f"pure step rep{i}: {time.time()-t0:.2f}s")

    t0 = time.time()
    out_np = {k: np.asarray(v) for k, v in out.items()}
    print(f"D2H all outputs: {time.time()-t0:.2f}s "
          f"({sum(v.nbytes for v in out_np.values())/1e6:.1f} MB)")

    t0 = time.time()
    keep = np.asarray(batch["masks_inner"]) & np.asarray(batch["valid"])
    sel = np.flatnonzero(keep)[:inner_cap]
    got = np.zeros(inner_cap, bool)
    got[:len(sel)] = True
    coords = np.asarray(batch["coords"])[sel] + np.asarray(batch["centers"])[sel]
    logits = out_np["semantic_prediction_logits"].astype(np.float32)[got]
    offs = out_np["offset_predictions"].astype(np.float32)[got]
    sl = np.asarray(batch["semantic_labels"])[sel]
    ol = np.asarray(batch["offset_labels"])[sel]
    il = np.asarray(batch["instance_labels"])[sel]
    inf_ = np.asarray(batch["input_feats"])[sel]
    print(f"harvest numpy: {time.time()-t0:.2f}s")

    # the full get_pointwise_preds wall for comparison
    tm = {}
    t0 = time.time()
    get_pointwise_preds(model, params, state,
                        stream.whole_plot_batches(min_bucket=cap),
                        voxel_capacity=cap, compute_dtype=jnp.bfloat16,
                        timings=tm, need_backbone=False)
    print(f"get_pointwise_preds total: {time.time()-t0:.2f}s  "
          f"(device_s {tm.get('device_s', 0):.2f} pure {tm.get('pure_step_s', 0):.2f})")


if __name__ == "__main__":
    main()
