"""Chained in-program timing of the full forward at the bench shape.

The timeit-style single-dispatch numbers (scripts/profile_evalstep.py) carry
tunnel jitter comparable to the thing measured; chaining CHAIN forwards inside
one program with input feedback measures pure device time.

Usage: python scripts/profile_fwd_chain.py
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
CHAIN = int(os.environ.get("CHAIN", 6))


def main():
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.mean(0)
    vox_pts, _, _ = voxel_downsample_trace_np(xyz, 0.1)
    n = len(vox_pts)
    print(f"{n} voxels, cap {CAP}, chain {CHAIN}")
    pad = np.zeros((CAP, 3), np.float32)
    pad[:n] = vox_pts
    coords = jnp.asarray(pad)
    feats = jnp.ones((CAP, 1), jnp.float32)
    bids = jnp.zeros((CAP,), jnp.int32)
    valid = jnp.asarray(np.arange(CAP) < n)

    nb = int(os.environ.get("NB", 7))
    model = TreeLearn(channels=32, num_blocks=nb, spatial_shape=SS,
                      use_coords=False, use_feats=False)
    params, state = model.init(0)
    params = jax.device_put(params)
    state = jax.device_put(state)

    @jax.jit
    def run(c0, seed):
        def body(i, carry):
            c, acc = carry
            out, _ = model.apply(params, state, c, feats, bids, valid,
                                 batch_size=1, voxel_capacity=CAP,
                                 training=False, compute_dtype=jnp.bfloat16)
            s = jnp.sum(out["semantic_prediction_logits"][:256])
            # feed a tiny jitter back into the coords so iterations differ
            c = c0 + (s * 1e-12 + seed * 7e-4 + i * 3e-4)
            return (c, acc + s)
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (c0, jnp.float32(0)))
        return acc

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    t0 = time.perf_counter()
    float(run(coords, jnp.float32(0)))
    print(f"compile+first {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for i in range(4):
        t0 = time.perf_counter()
        float(run(coords, jnp.float32(i)))
        best = min(best, time.perf_counter() - t0)
    print(f"forward (chained): {max(best-rtt, 0)/CHAIN*1e3:.1f} ms")


if __name__ == "__main__":
    main()
