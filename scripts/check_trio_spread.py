"""Measure the dy-trio window-sharing premise on bench-shaped data.

For each dx-group (dx fixed, dy in {-1,0,1}), the three bands' candidate
slots should lie in nearly the same window: the dy=+-1 shifts move keys by
+-Sz, i.e. ~one z-column of active voxels in slot space.  This prints, per
(dx-group, tile), the spread max(hi over trio) - min(lo over trio) that a
SHARED window must cover, vs the per-band spreads the current kernel covers.

Usage: JAX_PLATFORMS=cpu python scripts/check_trio_spread.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.ops.voxelize import voxel_downsample_trace_np

SS = (640, 640, 192)
CAP = 1 << 19
TILE = 256


def spreads(keys, v, sy, sz, tile):
    """per-band and per-trio window spreads from tile boundary keys."""
    ntiles = v // tile
    tk = keys.reshape(ntiles, tile)
    live = tk < np.iinfo(np.int32).max
    kmin = np.where(live.any(1), np.min(np.where(live, tk, 2**62), axis=1), 0)
    kmax = np.where(live.any(1), np.max(np.where(live, tk, -1), axis=1), 0)
    live_t = live.any(1)
    deltas = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            deltas.append(dx * sy * sz + dy * sz)
    deltas = np.array(deltas)
    lo = np.searchsorted(keys, kmin[None, :] + deltas[:, None] - 1, "left")
    hi = np.searchsorted(keys, kmax[None, :] + deltas[:, None] + 1, "right")
    band = (hi - lo)[:, live_t]                       # (9, live tiles)
    lo3 = lo.reshape(3, 3, ntiles).min(axis=1)
    hi3 = hi.reshape(3, 3, ntiles).max(axis=1)
    trio = (hi3 - lo3)[:, live_t]                     # (3, live tiles)
    return band, trio


def report(name, arr):
    a = arr.ravel()
    print(f"{name}: mean {a.mean():7.1f}  p50 {np.percentile(a, 50):7.0f}"
          f"  p99 {np.percentile(a, 99):7.0f}  p99.9 {np.percentile(a, 99.9):7.0f}"
          f"  max {a.max():7.0f}")


def main():
    for seed, extent, npts in ((0, 60.0, 968000), (7, 100.0, 3000000)):
        n_trees = int(48 * (extent / 60.0) ** 2)
        data, _ = make_synthetic_forest(
            n_trees=n_trees, extent=extent,
            points_per_tree=16000,
            ground_points=max(npts - n_trees * 16000, 10000), seed=seed)
        xyz = data[:, :3].astype(np.float32)
        xyz -= xyz.min(0)
        vox, _, _ = voxel_downsample_trace_np(xyz, 0.1)
        ijk = np.floor(vox / 0.1).astype(np.int64)
        sx = int(ijk[:, 0].max()) + 1
        sy = int(ijk[:, 1].max()) + 1
        sz = int(ijk[:, 2].max()) + 1
        keys = np.unique(ijk @ np.array([sy * sz, sz, 1], dtype=np.int64))
        v = ((len(keys) + TILE - 1) // TILE) * TILE
        pad = np.full(v, np.iinfo(np.int32).max, np.int64)
        pad[:len(keys)] = keys
        print(f"\nplot seed={seed}: {len(keys)} voxels, shape ({sx},{sy},{sz})")
        band, trio = spreads(pad, v, sy, sz, TILE)
        report("  per-band spread", band)
        report("  trio   spread  ", trio)
        for w in (768, 896, 1024):
            print(f"  shared window {w}: covers "
                  f"{100 * (trio <= w - 8).mean():.3f}% of (group, tile)s; "
                  f"all-tiles-ok={bool((trio <= w - 8).all())}")


if __name__ == "__main__":
    main()
