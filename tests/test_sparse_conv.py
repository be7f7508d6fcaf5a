"""Sparse conv engine vs dense XLA conv oracles on tiny grids.

Validates the three spconv-parity ops (SubMConv3d / SparseConv3d k2s2 /
SparseInverseConv3d, reference blocks.py:57,104,118) against
lax.conv_general_dilated and its vjp on densified grids.
"""

import jax
import jax.numpy as jnp
import numpy as np

from treelearn_tpu.ops import (
    build_downsample,
    build_subm_rulebook,
    down_conv,
    grid_from_coords,
    inverse_conv,
    subm_conv,
)

DIMS = ("NXYZC", "XYZIO", "NXYZC")


def _random_active(rng, shape, n, batch=1):
    coords = set()
    while len(coords) < n:
        coords.add((
            rng.integers(0, batch),
            rng.integers(0, shape[0]),
            rng.integers(0, shape[1]),
            rng.integers(0, shape[2]),
        ))
    return np.array(sorted(coords), np.int32)


def _densify(coords, feats, shape, batch, n_ch):
    dense = np.zeros((batch, *shape, n_ch), np.float32)
    for c, f in zip(coords, feats):
        dense[c[0], c[1], c[2], c[3]] = f
    return jnp.asarray(dense)


def test_subm_conv_matches_dense():
    rng = np.random.default_rng(0)
    shape, batch, cin, cout = (7, 6, 5), 2, 4, 3
    coords = _random_active(rng, shape, 40, batch)
    feats_np = rng.normal(size=(len(coords), cin)).astype(np.float32)
    weight = rng.normal(size=(27, cin, cout)).astype(np.float32)

    grid, inv = grid_from_coords(jnp.asarray(coords), shape, capacity=64)
    vfeats = jnp.zeros((64, cin)).at[inv].set(jnp.asarray(feats_np))
    rule = build_subm_rulebook(grid, 3)
    out = subm_conv(vfeats, jnp.asarray(weight), rule, grid.live_mask)

    dense_in = _densify(coords, feats_np, shape, batch, cin)
    kernel = jnp.asarray(weight.reshape(3, 3, 3, cin, cout))
    dense_out = jax.lax.conv_general_dilated(
        dense_in, kernel, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=DIMS)

    # submanifold: output only at active sites, equal to dense conv there
    gc = np.asarray(grid.coords)
    n_active = int(grid.n_active)
    for i in range(n_active):
        b, x, y, z = gc[i]
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(dense_out[b, x, y, z]), rtol=1e-4, atol=1e-4)
    assert (np.asarray(out[n_active:]) == 0).all()


def test_down_conv_matches_dense_strided():
    rng = np.random.default_rng(1)
    shape, batch, cin, cout = (7, 6, 8), 2, 3, 5  # odd x: exercises child dropping
    coords = _random_active(rng, shape, 50, batch)
    feats_np = rng.normal(size=(len(coords), cin)).astype(np.float32)
    weight = rng.normal(size=(8, cin, cout)).astype(np.float32)

    grid, inv = grid_from_coords(jnp.asarray(coords), shape, capacity=64)
    vfeats = jnp.zeros((64, cin)).at[inv].set(jnp.asarray(feats_np))
    rb = build_downsample(grid, out_capacity=64)
    out = down_conv(vfeats, jnp.asarray(weight), rb)

    dense_in = _densify(coords, feats_np, shape, batch, cin)
    kernel = jnp.asarray(weight.reshape(2, 2, 2, cin, cout))
    dense_out = jax.lax.conv_general_dilated(
        dense_in, kernel, (2, 2, 2), "VALID", dimension_numbers=DIMS)
    assert dense_out.shape[1:4] == (3, 3, 4)

    oc = np.asarray(rb.out_grid.coords)
    n_out = int(rb.out_grid.n_active)
    assert n_out > 0
    for i in range(n_out):
        b, x, y, z = oc[i]
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(dense_out[b, x, y, z]), rtol=1e-4, atol=1e-4)
    # output active set == parents of non-dropped children
    expect = {(c[0], c[1] // 2, c[2] // 2, c[3] // 2)
              for c in coords if c[1] // 2 < 3 and c[2] // 2 < 3 and c[3] // 2 < 4}
    assert {tuple(r) for r in oc[:n_out]} == expect


def test_inverse_conv_is_transpose_of_strided():
    rng = np.random.default_rng(2)
    shape, batch, c_coarse, c_fine = (6, 7, 8), 1, 4, 3
    coords = _random_active(rng, shape, 40, batch)
    weight = rng.normal(size=(8, c_coarse, c_fine)).astype(np.float32)

    grid, _ = grid_from_coords(jnp.asarray(coords), shape, capacity=64)
    rb = build_downsample(grid, out_capacity=64)
    n_out = int(rb.out_grid.n_active)
    coarse_np = rng.normal(size=(64, c_coarse)).astype(np.float32)
    coarse_np[n_out:] = 0
    out = inverse_conv(jnp.asarray(coarse_np), jnp.asarray(weight), rb, grid.live_mask)

    # oracle: vjp of the dense strided conv with channel-transposed kernel
    kernel = jnp.asarray(weight.transpose(0, 2, 1).reshape(2, 2, 2, c_fine, c_coarse))

    def f(x):
        return jax.lax.conv_general_dilated(x, kernel, (2, 2, 2), "VALID",
                                            dimension_numbers=DIMS)

    dense_coarse = np.zeros((batch, 3, 3, 4, c_coarse), np.float32)
    oc = np.asarray(rb.out_grid.coords)
    for i in range(n_out):
        b, x, y, z = oc[i]
        dense_coarse[b, x, y, z] = coarse_np[i]

    primal = jnp.zeros((batch, *shape, c_fine))
    _, vjp_fn = jax.vjp(f, primal)
    dense_fine = vjp_fn(jnp.asarray(dense_coarse))[0]

    gc = np.asarray(grid.coords)
    for i in range(int(grid.n_active)):
        b, x, y, z = gc[i]
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(dense_fine[b, x, y, z]), rtol=1e-4, atol=1e-4)


def test_rulebook_center_is_identity():
    rng = np.random.default_rng(3)
    coords = _random_active(rng, (5, 5, 5), 20)
    grid, _ = grid_from_coords(jnp.asarray(coords), (5, 5, 5), capacity=32)
    rule = np.asarray(build_subm_rulebook(grid, 3))
    n = int(grid.n_active)
    np.testing.assert_array_equal(rule[13, :n], np.arange(n))
    assert (rule[:, n:] == -1).all()
