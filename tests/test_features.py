"""Verticality feature kernel: geometric sanity + eigensolver correctness."""

import numpy as np

from treelearn_tpu.ops.features import compute_verticality, smallest_eigvec_sym3


def test_smallest_eigvec_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 3, 3))
    sym = (a + a.transpose(0, 2, 1)) / 2
    vec = np.asarray(smallest_eigvec_sym3(jnp.asarray(sym, jnp.float32)))
    w, v = np.linalg.eigh(sym)
    want = v[:, :, 0]  # eigenvector of smallest eigenvalue
    # compare up to sign
    dots = np.abs(np.sum(vec * want, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_verticality_trunk_vs_ground():
    rng = np.random.default_rng(1)
    # vertical cylinder surface (trunk): normal horizontal -> verticality ~1
    theta = rng.uniform(0, 2 * np.pi, 2000)
    z = rng.uniform(0, 4, 2000)
    trunk = np.column_stack([0.15 * np.cos(theta), 0.15 * np.sin(theta), z])
    # ground plane: normal vertical -> verticality ~0
    ground = np.column_stack([rng.uniform(5, 10, 2000),
                              rng.uniform(5, 10, 2000),
                              rng.normal(0, 0.02, 2000)])
    pts = np.vstack([trunk, ground]).astype(np.float32)
    vert = compute_verticality(pts, search_radius=0.6, cell_cap=64).reshape(-1)
    assert np.median(vert[:2000]) > 0.75, np.median(vert[:2000])
    assert np.median(vert[2000:]) < 0.2, np.median(vert[2000:])
