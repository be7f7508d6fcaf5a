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


def _pow2(x):
    return 1 << int(np.ceil(np.log2(max(int(x), 1))))


cap = _pow2(len(pts))
counts = level_voxel_counts_np(pts, VS, ss, NB)
caps = tuple(min(max(_pow2(int(c * 1.02)), 512), cap) for c in counts)
caps = (cap,) + caps[1:]
tiles = [level_tile_window(32 * (l + 1))[0] for l in range(NB)]
req = level_span_windows_np(pts, VS, ss, NB, tiles, slack=0)


def wins_for(ladder):
    return tuple(min(next((c for c in ladder
                           if c >= r + (128 if cp >= (1 << 21) else 16)),
                          ((r + 128 + 127) // 128) * 128), int(cp))
                 for r, cp in zip(req, caps))


SHIPPED = (512, 640, 768, 1024, 1536, 2048, 3072, 4096)
EXTENDED = (256, 384, 512, 640, 768, 1024, 1536, 2048, 3072, 4096)

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
