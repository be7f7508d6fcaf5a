"""Micro-benchmark of the banded Pallas submanifold conv on the real chip.

Measures the packed-banded kernel (ops/pallas_conv.py:subm_conv_banded)
against the XLA gather fallback (ops/sparse.py:subm_conv) on realistic
shapes — the U-Net's hot L0/L1 levels (V=128k/32k voxels, C=32/64) — and
checks correctness of the compiled (non-interpret) Mosaic kernel on-device.

Usage: python tools/microbench_conv.py [V] [C]
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

from treelearn_tpu.ops.pallas_conv import rule_spans, subm_conv_banded
from treelearn_tpu.ops.sparse import build_subm_rulebook, grid_from_coords, subm_conv


def make_case(v_cap, cin, cout, density=0.35, seed=0):
    """Sorted voxel grid shaped like one forest tile at 0.1 m voxels."""
    rng = np.random.default_rng(seed)
    n = int(v_cap * density)
    shape = (350, 350, 220)
    seen = set()
    # clustered columns (trees) so the key distribution resembles real tiles
    while len(seen) < n:
        cx, cy = rng.integers(20, 330, 2)
        for _ in range(rng.integers(40, 200)):
            x = int(np.clip(cx + rng.normal(0, 4), 0, 349))
            y = int(np.clip(cy + rng.normal(0, 4), 0, 349))
            z = int(rng.integers(0, 220))
            seen.add((0, x, y, z))
            if len(seen) >= n:
                break
    coords = np.array(sorted(seen), np.int32)
    grid, _ = grid_from_coords(jnp.asarray(coords), shape, capacity=v_cap)
    rule = build_subm_rulebook(grid, 3)
    feats = jnp.asarray(rng.normal(size=(v_cap, cin)).astype(np.float32))
    feats = jnp.where(grid.live_mask[:, None], feats, 0.0).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32)
                    ).astype(jnp.bfloat16)
    return grid, rule, feats, w, n


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    v_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    cin = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cout = cin
    print(f"device={jax.devices()[0]} V={v_cap} C={cin}->{cout}")
    grid, rule, feats, w, n_live = make_case(v_cap, cin, cout)
    spans = jax.jit(rule_spans, static_argnums=(1, 2, 3))(rule, 128, 512, v_cap)
    print(f"live={n_live} spans.ok={bool(spans.ok)}")

    banded = jax.jit(lambda f, w: subm_conv_banded(f, w, rule, grid.live_mask,
                                                   spans=spans))
    xla = jax.jit(lambda f, w: subm_conv(f, w, rule, grid.live_mask,
                                         center_identity=True))

    t_x, out_x = timeit(xla, feats, w)
    t_b, out_b = timeit(banded, feats, w)

    a = np.asarray(out_b, np.float32)
    b = np.asarray(out_x, np.float32)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
    # useful conv FLOPs: 2 * nnz(rule) * cin * cout
    nnz = int(np.asarray((rule >= 0).sum()))
    flops = 2 * nnz * cin * cout
    print(f"XLA    : {t_x * 1e3:8.3f} ms  {flops / t_x / 1e12:6.2f} TF/s")
    print(f"banded : {t_b * 1e3:8.3f} ms  {flops / t_b / 1e12:6.2f} TF/s  "
          f"speedup {t_x / t_b:.1f}x  rel_err {err:.2e}")
    assert err < 0.05, f"banded kernel wrong: rel_err={err}"


if __name__ == "__main__":
    main()
