"""Banded Pallas conv: host-side span logic on CPU; kernel parity on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treelearn_tpu.ops.pallas_conv import banded_spans_ok, rule_spans
from treelearn_tpu.ops.sparse import build_subm_rulebook, grid_from_coords, subm_conv


def _grid(n=1500, shape=(30, 30, 60), cap=2048, seed=0):
    rng = np.random.default_rng(seed)
    coords = set()
    while len(coords) < n:
        coords.add((0, rng.integers(0, shape[0]), rng.integers(0, shape[1]),
                    rng.integers(0, shape[2])))
    coords = np.array(sorted(coords), np.int32)
    return grid_from_coords(jnp.asarray(coords), shape, capacity=cap)


def test_rule_spans():
    grid, _ = _grid()
    rule = build_subm_rulebook(grid, 3)
    sp = rule_spans(rule, 256, 512, 2048)
    lo = np.asarray(sp.lo)
    assert lo.shape == (9, 8)
    assert (lo % 64 == 0).all()
    assert (lo >= 0).all() and (lo <= 2048 - 512).all()
    # decoded r0 + d reconstructs the rule over valid entries, with run
    # deltas <= 2 (consecutive-keys property: dz neighbors are K-1, K, K+1)
    rb = np.asarray(rule).reshape(9, 3, -1)
    rd = np.asarray(sp.rd)
    r0 = rd >> 6
    d = np.stack([((rd >> (2 * dz)) & 3) - 1 for dz in range(3)], axis=1)
    valid = rb >= 0
    assert (d[valid] >= 0).all() and (d[valid] <= 2).all()
    assert ((rd >= 0)[:, None, :] | ~valid).all()  # valid entry => band word
    np.testing.assert_array_equal(rb[valid],
                                  (r0[:, None, :].repeat(3, 1) + d)[valid])
    # sorted-key rulebooks on compact grids are banded
    assert bool(sp.ok)
    assert bool(banded_spans_ok(rule, 256, 512, 2048))
    # a deliberately scattered rulebook is not
    bad = jnp.zeros_like(rule).at[:, 0].set(0).at[:, 1].set(2047)
    assert not bool(banded_spans_ok(bad, 256, 512, 2048))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_banded_conv_matches_xla_on_tpu():
    from treelearn_tpu.ops.pallas_conv import subm_conv_fast

    rng = np.random.default_rng(1)
    grid, inv = _grid(seed=1)
    feats = jnp.zeros((2048, 32), jnp.float32).at[inv].set(
        jnp.asarray(rng.normal(size=(int(grid.n_active), 32)).astype(np.float32)),
        mode="drop")
    rule = build_subm_rulebook(grid, 3)
    W = jnp.asarray((rng.normal(size=(27, 32, 32)) * 0.1).astype(np.float32))

    ref = subm_conv(feats.astype(jnp.bfloat16), W.astype(jnp.bfloat16), rule,
                    grid.live_mask)
    out = subm_conv_fast(feats.astype(jnp.bfloat16), W, rule, grid.live_mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.02)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_custom_vjp_matches_xla_autodiff_on_tpu():
    from treelearn_tpu.ops.pallas_conv import rule_conv_ad

    rng = np.random.default_rng(3)
    grid, inv = _grid(seed=3)
    rule = build_subm_rulebook(grid, 3)
    x = jnp.where(grid.live_mask[:, None],
                  jnp.asarray(rng.normal(size=(2048, 32)).astype(np.float32)), 0.0)
    W = jnp.asarray((rng.normal(size=(27, 32, 32)) * 0.1).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2048, 32)).astype(np.float32))

    def loss_ad(x, W):
        return jnp.sum(rule_conv_ad(x, W, rule, rule, grid.live_mask,
                                    grid.live_mask, None, None,
                                    True, True, None) * cot)

    def loss_xla(x, W):
        return jnp.sum(subm_conv(x, W, rule, grid.live_mask) * cot)

    dx1, dw1 = jax.grad(loss_ad, argnums=(0, 1))(x, W)
    dx2, dw2 = jax.grad(loss_xla, argnums=(0, 1))(x, W)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), atol=1e-2, rtol=1e-2)


def test_banded_conv_interpret_mode_parity(monkeypatch):
    """Small interpret-mode run of the banded kernel on CPU: fast enough for
    CI, catches kernel-logic regressions without a TPU."""
    import treelearn_tpu.ops.pallas_conv as pc

    monkeypatch.setattr(pc, "_INTERPRET", True)
    rng = np.random.default_rng(5)
    grid, inv = _grid(n=300, shape=(12, 12, 24), cap=512, seed=5)
    feats = jnp.where(grid.live_mask[:, None],
                      jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32)),
                      0.0)
    rule = build_subm_rulebook(grid, 3)
    W = jnp.asarray((rng.normal(size=(27, 8, 8)) * 0.1).astype(np.float32))

    ref = subm_conv(feats, W, rule, grid.live_mask)
    out = pc.subm_conv_banded(feats, W, rule, grid.live_mask,
                              tile=256, window=512)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.02, rtol=0.02)


def test_dw_kernel_interpret_mode_parity(monkeypatch):
    """Interpret-mode parity of the Pallas weight-gradient kernel vs the XLA
    gather-based dW."""
    import treelearn_tpu.ops.pallas_conv as pc

    monkeypatch.setattr(pc, "_INTERPRET", True)
    rng = np.random.default_rng(6)
    grid, _ = _grid(n=300, shape=(12, 12, 24), cap=512, seed=6)
    rule = build_subm_rulebook(grid, 3)
    x = jnp.where(grid.live_mask[:, None],
                  jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32)), 0.0)
    g = jnp.where(grid.live_mask[:, None],
                  jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32)), 0.0)

    want = pc.rule_conv_dw_xla(x, g, rule, grid.live_mask)
    got = pc.rule_conv_dw_banded(x, g, rule, grid.live_mask,
                                 tile=256, window=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)
