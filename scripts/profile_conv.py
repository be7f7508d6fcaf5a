"""Microbench the banded subm conv + rulebook build at L0 scale on real TPU.

Usage: python scripts/profile_conv.py [n_active]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.ops.sparse import (build_dense_table, build_subm_rulebook,
                                      grid_from_sorted_keys)
from treelearn_tpu.ops.pallas_conv import (DEFAULT_TILE, DEFAULT_WINDOW,
                                           rule_spans, subm_conv_banded)

_RTT = [0.0]


def timeit(fn, argsets, reps=4):
    wrapped = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, l: acc + jnp.sum(l).astype(jnp.float32),
        fn(*a), jnp.float32(0)))
    float(wrapped(*argsets[0]))
    ts = []
    for i in range(reps):
        a = argsets[i % len(argsets)]
        t0 = time.perf_counter()
        float(wrapped(*a))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - _RTT[0], 0.0)


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 437740
    capacity = 1 << 19
    spatial_shape = np.array([640, 640, 192], np.int32)

    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=9000,
                                    ground_points=968000 - 48 * 9000, seed=3)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.min(0)
    keys = np.unique((np.floor(xyz / 0.1).astype(np.int64)
                      @ np.array([640 * 192, 192, 1], np.int64)))
    rng = np.random.default_rng(0)
    if len(keys) > n_target:
        keys = np.sort(rng.choice(keys, n_target, replace=False))
    n = len(keys)
    print(f"active voxels: {n}")

    keys_pad = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    keys_pad[:n] = keys
    gsets = []
    for i in range(3):
        kk = keys_pad.copy()
        if i:
            kk[:n] = np.sort(np.unique(kk[:n] + np.int32(i)))[:n]
        gsets.append(kk)

    # RTT
    f = jax.jit(lambda x: x + 1)
    tiny = [jnp.float32(i) for i in range(4)]
    float(f(tiny[0]))
    ts = []
    for a in tiny:
        t0 = time.perf_counter(); float(f(a)); ts.append(time.perf_counter() - t0)
    _RTT[0] = min(ts)
    print(f"RTT {_RTT[0]*1e3:.1f} ms")

    table_size = int(640 * 640 * 192)

    def mkgrid(k):
        return grid_from_sorted_keys(k, jnp.asarray(spatial_shape),
                                     jnp.sum((k != np.iinfo(np.int32).max)
                                             .astype(jnp.int32)))

    def rule_of(k):
        g = mkgrid(k)
        t = build_dense_table(g, table_size)
        return build_subm_rulebook(g, 3, dense_table=t)

    t = timeit(lambda k: rule_of(k), [(jnp.asarray(k),) for k in gsets])
    print(f"rule build (table+27probes): {t*1e3:8.1f} ms")

    t = timeit(lambda k: rule_spans(rule_of(k), DEFAULT_TILE, DEFAULT_WINDOW,
                                    capacity).rd,
               [(jnp.asarray(k),) for k in gsets])
    print(f"rule + spans:                {t*1e3:8.1f} ms")

    # static rule/spans for conv timing
    k0 = jnp.asarray(gsets[0])
    g0 = mkgrid(k0)
    rule = jax.jit(rule_of)(k0)
    spans = jax.jit(lambda r: rule_spans(r, DEFAULT_TILE, DEFAULT_WINDOW,
                                         capacity))(rule)
    live = g0.live_mask

    cin = cout = 32
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    fsets = [jnp.asarray(rng.normal(size=(capacity, cin)).astype(np.float32),
                         jnp.bfloat16) for _ in range(3)]

    t = timeit(lambda f_: subm_conv_banded(f_, w, rule, live,
                                           spans=spans),
               [(f_,) for f_ in fsets])
    nnz = int(np.asarray(jnp.sum(rule >= 0)))
    flops = 2 * nnz * cin * cout
    print(f"subm_conv_banded C32:        {t*1e3:8.1f} ms   "
          f"({flops/1e9:.1f} GF useful -> {flops/max(t,1e-9)/1e12:.2f} TF/s)")

    # BN+ReLU elementwise at L0 size
    def bnrelu(f_):
        m = jnp.mean(f_, axis=0)
        v = jnp.mean(jnp.square(f_), axis=0) - m * m
        y = (f_ - m) * jax.lax.rsqrt(v + 1e-4)
        return jnp.maximum(y, 0)

    t = timeit(bnrelu, [(f_,) for f_ in fsets])
    print(f"BN+ReLU (524k, 32) bf16:     {t*1e3:8.1f} ms")

    # chain of 8 convs (L0's residual blocks) to amortize dispatch
    def chain8(f_):
        for _ in range(8):
            f_ = subm_conv_banded(f_, w, rule, live, spans=spans)
        return f_

    t = timeit(chain8, [(f_,) for f_ in fsets])
    print(f"8x subm_conv_banded:         {t*1e3:8.1f} ms   ({t/8*1e3:.1f} ms each)")


if __name__ == "__main__":
    main()
