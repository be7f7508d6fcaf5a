"""Measured per-level conv windows (ops/voxelize.py:level_span_windows_np).

The host mirrors the device's level key sets and band-span test
(ops/pallas_rd.py:build_spans_banded), so the window it returns must make
the device spans check pass (ok=True) — that is the whole contract: a
mis-measured window silently reroutes inference into the whole-batch
exact-XLA fallback (which at 4M voxels crashed the TPU worker, round-5
10M probe).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from treelearn_tpu.model.blocks import level_tile_window
from treelearn_tpu.ops.hashing import SENTINEL
from treelearn_tpu.ops.pallas_conv import rule_spans
from treelearn_tpu.ops.sparse import (build_dense_table, build_subm_rulebook,
                                      grid_from_sorted_keys)
from treelearn_tpu.ops.voxelize import level_span_windows_np


def _keys_of(pts, vs, ss):
    ijk = np.floor((pts - pts.min(axis=0)) / np.float32(vs)).astype(np.int64)
    ijk = np.clip(ijk, 0, np.asarray(ss) - 1)
    return np.unique((ijk[:, 0] * ss[1] + ijk[:, 1]) * ss[2] + ijk[:, 2])


def _spans_ok(keys, ss, tile, window):
    n = len(keys)
    cap = max(1 << int(np.ceil(np.log2(max(n, 1024)))), tile)
    pad = np.full(cap, np.iinfo(np.int32).max, np.int32)
    pad[:n] = keys
    grid = grid_from_sorted_keys(jnp.asarray(pad),
                                 jnp.asarray(np.asarray(ss, np.int32)),
                                 jnp.int32(n))
    table = build_dense_table(grid, int(np.prod(ss)))
    rule = build_subm_rulebook(grid, 3, dense_table=table)
    return bool(np.asarray(rule_spans(rule, tile, window, cap).ok))


@pytest.mark.parametrize("layout", ["dense_gradient", "uniform"])
def test_measured_window_makes_spans_ok(layout):
    rng = np.random.default_rng(11)
    if layout == "uniform":
        pts = rng.uniform(0, 20, (40000, 3)).astype(np.float32)
        pts[:, 2] *= 0.3
    else:
        # strong x-density gradient: dense slab next to sparse field — the
        # layout that overflows a fixed 3x-tile window (a tile's dx-neighbor
        # interval holds far more active voxels than the tile itself)
        slab = rng.uniform([0, 0, 0], [2.0, 20, 6], (60000, 3))
        field = rng.uniform([2.0, 0, 0], [20, 20, 6], (8000, 3))
        pts = np.concatenate([slab, field]).astype(np.float32)
    vs = 0.1
    ss = [256, 256, 64]
    tiles = [level_tile_window(32 * (l + 1))[0] for l in range(3)]
    req = level_span_windows_np(pts, vs, ss, 3, tiles)
    keys = _keys_of(pts, vs, ss)
    w0 = max(((req[0] + 127) // 128) * 128, 512)
    assert _spans_ok(keys, ss, tiles[0], w0)


def test_fixed_window_insufficient_on_gradient():
    """The gradient layout genuinely needs more than the 3x-tile default —
    guards against the mirror trivially passing because every window does."""
    rng = np.random.default_rng(11)
    slab = rng.uniform([0, 0, 0], [2.0, 20, 6], (60000, 3))
    field = rng.uniform([2.0, 0, 0], [20, 20, 6], (8000, 3))
    pts = np.concatenate([slab, field]).astype(np.float32)
    ss = [256, 256, 64]
    tiles = [level_tile_window(32 * (l + 1))[0] for l in range(3)]
    req = level_span_windows_np(pts, 0.1, ss, 3, tiles)
    keys = _keys_of(pts, 0.1, ss)
    if req[0] - 128 > 768 + 8:  # slack + margin above the default
        assert not _spans_ok(keys, ss, tiles[0], 768)
