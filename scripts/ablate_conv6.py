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

    mode = os.environ.get("TL_CONV_SELECT", "roll")
    capacity = 1 << 17
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=9000,
                                    ground_points=968000 - 48 * 9000, seed=3)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.min(0)
    keys = np.unique((np.floor(xyz / 0.1).astype(np.int64)
                      @ np.array([640 * 192, 192, 1], np.int64)))
    rng = np.random.default_rng(0)
    n = min(len(keys), 114576)  # L0 count of the bench plot
    keys = np.sort(rng.choice(keys, n, replace=False))
    keys_pad = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    keys_pad[:n] = keys
    k0 = jnp.asarray(keys_pad)
    g0 = grid_from_sorted_keys(
        k0, jnp.asarray(np.array([640, 640, 192], np.int32)), jnp.int32(n))
    table = build_dense_table(g0, 640 * 640 * 192)
    rule = jax.jit(lambda g, t: build_subm_rulebook(g, 3, dense_table=t))(
        g0, table)
    live = jnp.arange(capacity) < n
    spans = jax.jit(lambda r: rule_spans(r, 256, 768, capacity))(rule)
    ok = bool(np.asarray(spans.ok))

    # vary inputs per repetition and force one scalar D2H: identical
    # re-dispatches are deduped server-side and block_until_ready can no-op
    # through the tunnel (docs/performance.md profiling discipline)
    rtt_probe = jax.jit(lambda x: x + 1.0)
    float(rtt_probe(jnp.float32(0)))
    rtt = float("inf")
    for i in range(1, 4):
        t0 = time.time()
        float(rtt_probe(jnp.float32(i)))
        rtt = min(rtt, time.time() - t0)

    for cin, cout in ((32, 32), (64, 64)):
        feats = jax.device_put(
            rng.standard_normal((capacity, cin)).astype(np.float32))
        weight = jax.device_put(
            (rng.standard_normal((27, cin, cout)) * 0.1).astype(np.float32))

        CHAIN = 32  # amortize the 25-45 ms tunnel RTT over many kernels

        @jax.jit
        def conv_chain(f, eps):
            def body(_, x):
                y = subm_conv_banded(x, weight, rule, live, 256, 768,
                                     spans=spans)
                # renormalize so the chain neither explodes nor denorms
                return y * jax.lax.rsqrt(
                    jnp.mean(jnp.square(y)).astype(y.dtype) + 1e-12)
            out = jax.lax.fori_loop(0, CHAIN, body, f + eps)
            return jnp.sum(out[:8, :8].astype(jnp.float32))

        float(conv_chain(feats, jnp.float32(0)))  # compile
        best = float("inf")
        for i in range(1, 6):
            t0 = time.time()
            float(conv_chain(feats, jnp.float32(i * 1e-4)))
            best = min(best, time.time() - t0)
        dt = (best - rtt) / CHAIN
        print(f"[{mode}] cap {capacity} cin {cin} cout {cout} n_vox {n} "
              f"spans_ok {ok}: {dt*1e3:.2f} ms/conv (chain {CHAIN}, "
              f"rtt {rtt*1e3:.1f})", flush=True)


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
