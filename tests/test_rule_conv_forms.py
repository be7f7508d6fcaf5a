"""Gather-form down/inverse rules must reproduce the scatter-form ops."""

import jax.numpy as jnp
import numpy as np

from treelearn_tpu.ops.sparse import (
    build_down_rule,
    build_downsample,
    build_inverse_rule,
    down_conv,
    grid_from_coords,
    inverse_conv,
    subm_conv,
)


def _grid(n=800, shape=(16, 16, 32), cap=1024, seed=0):
    rng = np.random.default_rng(seed)
    coords = set()
    while len(coords) < n:
        coords.add((0, rng.integers(0, shape[0]), rng.integers(0, shape[1]),
                    rng.integers(0, shape[2])))
    coords = np.array(sorted(coords), np.int32)
    return grid_from_coords(jnp.asarray(coords), shape, capacity=cap)


def test_down_rule_matches_scatter_form():
    rng = np.random.default_rng(1)
    grid, inv = _grid()
    rb = build_downsample(grid, out_capacity=1024)
    feats = jnp.asarray(rng.normal(size=(1024, 8)).astype(np.float32))
    feats = jnp.where(grid.live_mask[:, None], feats, 0.0)
    W = jnp.asarray((rng.normal(size=(8, 8, 16)) * 0.2).astype(np.float32))

    want = down_conv(feats, W, rb)
    rule = build_down_rule(rb, grid)
    got = subm_conv(feats, W, rule, rb.out_grid.live_mask, center_identity=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)
    # per-corner monotonicity over valid entries (banded-kernel precondition)
    r = np.asarray(rule)
    for k in range(8):
        vals = r[k][r[k] >= 0]
        assert (np.diff(vals) > 0).all()


def test_inverse_rule_matches_direct_form():
    rng = np.random.default_rng(2)
    grid, _ = _grid(seed=2)
    rb = build_downsample(grid, out_capacity=1024)
    coarse = jnp.asarray(rng.normal(size=(1024, 16)).astype(np.float32))
    coarse = jnp.where(rb.out_grid.live_mask[:, None], coarse, 0.0)
    W = jnp.asarray((rng.normal(size=(8, 16, 8)) * 0.2).astype(np.float32))

    want = inverse_conv(coarse, W, rb, grid.live_mask)
    rule = build_inverse_rule(rb)
    got = subm_conv(coarse, W, rule, grid.live_mask, center_identity=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)
    r = np.asarray(rule)
    for k in range(8):
        vals = r[k][r[k] >= 0]
        if len(vals) > 1:
            assert (np.diff(vals) >= 0).all()
