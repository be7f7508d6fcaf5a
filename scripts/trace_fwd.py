"""Trace one bare forward at the bench shape and aggregate device time by op
family (plan/rd build vs banded convs vs down/inv convs vs BN/heads/voxelize).

Usage: python scripts/trace_fwd.py [trace_dir]
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

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.model import TreeLearn
from treelearn_tpu.ops.voxelize import voxel_downsample_trace_np

SS = (640, 640, 192)
CAP = 1 << 19
TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace_fwd"


def main():
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.mean(0)
    vox_pts, _, _ = voxel_downsample_trace_np(xyz, 0.1)
    n = len(vox_pts)
    print(f"{n} voxels, cap {CAP}")
    pad = np.zeros((CAP, 3), np.float32)
    pad[:n] = vox_pts
    coords = jnp.asarray(pad)
    feats = jnp.ones((CAP, 1), jnp.float32)
    bids = jnp.zeros((CAP,), jnp.int32)
    valid = jnp.asarray(np.arange(CAP) < n)

    model = TreeLearn(channels=32, num_blocks=7, spatial_shape=SS,
                      use_coords=False, use_feats=False)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)

    @jax.jit
    def fwd(c):
        out, _ = model.apply(params, state, c, feats, bids, valid,
                             batch_size=1, voxel_capacity=CAP,
                             training=False, compute_dtype=jnp.bfloat16)
        return out["semantic_prediction_logits"][:256].sum()

    t0 = time.perf_counter()
    float(fwd(coords))
    print(f"compile+first {time.perf_counter()-t0:.1f}s")
    float(fwd(coords + 7e-4))

    jax.profiler.start_trace(TRACE_DIR)
    float(fwd(coords + 3e-4))
    jax.profiler.stop_trace()
    print(f"trace in {TRACE_DIR}")

    os.system(f"python {os.path.dirname(os.path.abspath(__file__))}"
              f"/parse_trace.py {TRACE_DIR}")


if __name__ == "__main__":
    main()
