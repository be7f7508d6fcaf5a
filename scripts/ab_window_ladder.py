"""A/B the per-level conv window ladder on the bench whole-plot shape.

The production ladder (pipeline/run.py) floors at 512, but the measured
per-level span requirements at the bench plot are [590, 416, 305, 291, 265,
264, 144] — levels 2-6 pay a 512-wide selection for a <=321-wide need.  This
probe times the full eval-step forward with the shipped ladder vs one
extended down to 256/384, at identical capacities, on the real chip.

Usage: python bench.py first (leaves bench_workdir voxelized plot), then
       python scripts/ab_window_ladder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.model import TreeLearn
from treelearn_tpu.model.blocks import level_tile_window
from treelearn_tpu.ops.voxelize import (level_span_windows_np,
                                        level_voxel_counts_np)
from treelearn_tpu.pipeline.windows import (WINDOW_LADDER, pow2,
                                            select_level_caps,
                                            select_level_windows)

VS = 0.1
NB = 7
CHANNELS = 32

vox_path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_workdir", "plot",
    "forest_voxelized0.1", "bench_forest_centered.npz")
vox = np.load(vox_path)
pts = vox["points"].astype(np.float64)
ext = pts.max(axis=0) - pts.min(axis=0)
ss = [int(np.ceil((np.ceil(e / VS) + 2) / 64)) * 64 for e in ext]


cap = pow2(len(pts))
counts = level_voxel_counts_np(pts, VS, ss, NB)
caps = select_level_caps(counts, cap)
tiles = [level_tile_window(32 * (l + 1))[0] for l in range(NB)]
req = level_span_windows_np(pts, VS, ss, NB, tiles, slack=0)


def wins_for(ladder):
    # the production selection formula with a substitute ladder — imported,
    # not copied, so a policy change in pipeline/windows.py is measured here
    return select_level_windows(req, caps, ladder=ladder)


SHIPPED = WINDOW_LADDER
EXTENDED = (256, 384) + WINDOW_LADDER

model = TreeLearn(channels=CHANNELS, num_blocks=NB, kernel_size=3,
                  dim_coord=3, dim_feat=1, use_coords=False, use_feats=False,
                  spatial_shape=ss, voxel_size=VS)
params, state = model.init(0)
dev = jax.devices()[0]
params = jax.device_put(params, dev)
state = jax.device_put(state, dev)

n = cap
coords = np.zeros((n, 3), np.float32)
coords[: len(pts)] = pts
feats = np.ones((n, 1), np.float32)
bids = np.zeros(n, np.int32)
valid = np.zeros(n, bool)
valid[: len(pts)] = True
jb = tuple(jax.device_put(a, dev) for a in (coords, feats, bids, valid))

print(f"{len(pts)} voxels, cap {cap}, caps {caps}")
print(f"required {list(req)}")

for name, ladder in (("shipped", SHIPPED), ("extended", EXTENDED)):
    wins = wins_for(ladder)

    @jax.jit
    def f(params, state, coords, feats, bids, valid, _w=wins):
        out, _ = model.apply(params, state, coords, feats, bids, valid,
                             batch_size=1, voxel_capacity=cap,
                             training=False, compute_dtype=jnp.bfloat16,
                             level_capacities=caps, level_windows=_w)
        return (jnp.sum(out["semantic_prediction_logits"]),
                jnp.sum(out["offset_predictions"]),
                jnp.all(out.get("spans_ok", jnp.bool_(True))))

    t0 = time.time()
    r = jax.block_until_ready(f(params, state, *jb))
    print(f"{name} windows {wins}: first call {time.time()-t0:.1f}s "
          f"sums=({float(r[0]):.3f},{float(r[1]):.3f}) spans_ok={bool(r[2])}")
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f(params, state, *jb))
        best = min(best, time.time() - t0)
    print(f"{name}: best-of-5 full step {best:.4f}s")
