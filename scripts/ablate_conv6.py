"""Round-4 conv select ablation: legacy 4-phase vs miss-form roll select.

Times the production ``subm_conv_banded`` on realistic L0/L1 rulebooks (built
from a voxelized synthetic forest) under both ``TL_CONV_SELECT`` modes.  The
mode binds at import, so each mode runs in a subprocess; this wrapper prints
a side-by-side table.

Usage: python scripts/ablate_conv6.py            # both modes, table
       TL_CONV_SELECT=roll python scripts/ablate_conv6.py --one  # one mode
"""

import os
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def run_one():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from treelearn_tpu.data.synthetic import make_synthetic_forest
    from treelearn_tpu.ops.pallas_conv import rule_spans, subm_conv_banded
    from treelearn_tpu.ops.sparse import (build_dense_table,
                                          build_subm_rulebook,
                                          grid_from_sorted_keys)
    from treelearn_tpu.ops.voxelize import voxelize_points

    mode = os.environ.get("TL_CONV_SELECT", "roll")
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=16000,
                                    ground_points=200000, seed=0)
    pts = data[:, :3].astype(np.float32)
    dev = jax.devices()[0]

    def timeit(f, *a):
        jax.block_until_ready(f(*a))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(f(*a))
            best = min(best, time.time() - t0)
        return best

    rtt_probe = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(rtt_probe(jnp.float32(0)))
    rtt = min(timeit(rtt_probe, jnp.float32(i)) for i in range(1, 3))

    results = []
    for cap, cin, cout, vs in ((1 << 17, 32, 32, 0.1), (1 << 17, 64, 64, 0.2)):
        ext = pts.max(axis=0) - pts.min(axis=0)
        ss = [int(np.ceil(np.ceil(e / vs) + 2)) for e in ext]
        vox = voxelize_points(jax.device_put(pts, dev),
                              jnp.ones(len(pts), bool), vs, ss, cap)
        keys, live = vox.keys, vox.live
        grid = grid_from_sorted_keys(keys, live, ss)
        table = build_dense_table(grid, ss)
        rule = build_subm_rulebook(keys, live, table, ss)
        n_vox = int(jnp.sum(live))
        rng = np.random.default_rng(0)
        feats = jax.device_put(
            rng.standard_normal((cap, cin)).astype(np.float32), dev)
        weight = jax.device_put(
            (rng.standard_normal((27, cin, cout)) * 0.1).astype(np.float32),
            dev)
        spans = jax.jit(lambda r: rule_spans(r, 256, 768, cap))(rule)
        ok = bool(np.asarray(spans.ok))

        def conv(f):
            return subm_conv_banded(f, weight, rule, live, 256, 768,
                                    spans=spans)

        dt = timeit(conv, feats) - rtt
        results.append((cap, cin, cout, n_vox, ok, dt))
        print(f"[{mode}] cap {cap} cin {cin} cout {cout} n_vox {n_vox} "
              f"spans_ok {ok}: {dt*1e3:.2f} ms", flush=True)
    return results


def main():
    if "--one" in sys.argv:
        run_one()
        return
    for mode in ("legacy", "roll"):
        env = dict(os.environ, TL_CONV_SELECT=mode)
        subprocess.run([sys.executable, osp.abspath(__file__), "--one"],
                       env=env, check=False)


if __name__ == "__main__":
    main()
