"""Point->voxel pooling parity with the reference model's voxelize
(tree_learn.py:129-167): first-k-points-per-voxel mean, ones-masking,
[feat | coord] output order, per-batch-element min-cornered grids."""

import jax.numpy as jnp
import numpy as np

from treelearn_tpu.ops import devoxelize, voxel_downsample_trace_np, voxelize_points


def _reference_voxelize_np(coords, feats, batch_ids, batch_size, voxel_size,
                           max_pts, use_coords, use_feats):
    """Straightforward numpy oracle of the reference semantics."""
    all_feats = np.hstack([coords, feats])
    out = {}
    for b in range(batch_size):
        m = batch_ids == b
        c = coords[m]
        f = all_feats[m]
        mins = c.min(0)
        ijk = np.floor((c - mins) / voxel_size).astype(np.int64)
        voxdict = {}
        for i in range(len(c)):
            key = (b, *ijk[i])
            voxdict.setdefault(key, []).append(f[i])
        for key, rows in voxdict.items():
            pooled = np.mean(rows[:max_pts], axis=0)
            coord_part = pooled[:3]
            feat_part = pooled[3:]
            if not use_coords:
                coord_part = np.ones_like(coord_part)
            if not use_feats:
                feat_part = np.ones_like(feat_part)
            out[key] = np.concatenate([feat_part, coord_part])
    return out


def test_voxelize_points_matches_oracle():
    rng = np.random.default_rng(0)
    n, batch_size = 500, 2
    coords = rng.uniform(0, 2.0, size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    batch_ids = rng.integers(0, batch_size, n).astype(np.int32)

    for use_coords, use_feats in [(False, False), (True, True)]:
        vb = voxelize_points(
            jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.ones(n, bool), batch_size=batch_size, voxel_size=0.1,
            capacity=1024, max_pts=3, use_coords=use_coords, use_feats=use_feats,
        )
        oracle = _reference_voxelize_np(
            coords, feats, batch_ids, batch_size, 0.1, 3, use_coords, use_feats)

        n_vox = int(vb.n_voxels)
        assert n_vox == len(oracle)
        vc = np.asarray(vb.voxel_coords)[:n_vox]
        vf = np.asarray(vb.voxel_feats)[:n_vox]
        for i in range(n_vox):
            key = tuple(vc[i])
            assert key in oracle
            np.testing.assert_allclose(vf[i], oracle[key], rtol=1e-5, atol=1e-5)

        # v2p map: every point's voxel contains it
        v2p = np.asarray(vb.v2p_map)
        assert (v2p < n_vox).all()
        gathered = np.asarray(devoxelize(vb.voxel_feats, vb.v2p_map))
        for i in range(n):
            np.testing.assert_allclose(gathered[i], vf[v2p[i]], rtol=1e-6)


def test_voxelize_invalid_points_dropped():
    n = 64
    coords = np.random.rand(n, 3).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[:10] = True
    vb = voxelize_points(
        jnp.asarray(coords), jnp.ones((n, 1), jnp.float32),
        jnp.zeros(n, jnp.int32), jnp.asarray(valid),
        batch_size=1, voxel_size=10.0, capacity=16,
    )
    assert int(vb.n_voxels) == 1
    v2p = np.asarray(vb.v2p_map)
    assert (v2p[:10] == 0).all()
    assert (v2p[10:] == 16).all()  # dropped -> capacity
    gathered = np.asarray(devoxelize(vb.voxel_feats, vb.v2p_map))
    assert (gathered[10:] == 0).all()


def test_voxel_downsample_trace_np():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 1.0, size=(300, 3))
    down, first_idx, inverse = voxel_downsample_trace_np(pts, 0.25)
    assert len(down) == len(first_idx)
    assert inverse.max() == len(down) - 1
    # each original point maps to a voxel whose centroid is within half a diagonal
    d = np.linalg.norm(np.round(pts, 2) - down[inverse], ord=np.inf, axis=1)
    assert (d <= 0.25 + 1e-9).all()
    # first_idx rows belong to their voxel
    np.testing.assert_array_equal(inverse[first_idx], np.arange(len(down)))
    # voxels ordered by first occurrence
    assert (np.diff(first_idx) > 0).all()
