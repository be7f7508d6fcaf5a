"""Integer point-id plumbing: the streaming loaders thread each point's
original-cloud row id through inference so ensemble/propagate become integer
group-bys and scatters instead of quantized-coordinate joins (the reference's
pandas groupby / hash-dict propagation, util/pipeline.py:113-141, 423-465).
"""

import numpy as np

from treelearn_tpu.pipeline.ensemble import (
    ensemble_by_id,
    ensemble_named,
    ensemble_named_by_id,
    propagate_by_key,
)
from treelearn_tpu.pipeline.streaming import TileStream


def _plot(n=5000, extent=30.0, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, extent, (n, 3))
    pts[:, 2] *= 0.3
    labels = rng.integers(0, 5, n)
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    return pts, labels, feats


def test_tilestream_point_ids_map_to_original_rows():
    pts, labels, feats = _plot()
    stream = TileStream(pts, labels, feats, inner_edge=8, outer_edge=13.5,
                        stride=0.5)
    seen = 0
    for i in range(len(stream)):
        t = stream.tile(i)
        if t is None:
            continue
        ids = t["point_ids"]
        # de-centered tile coords must equal the original rows exactly
        xyz = t["points"].astype(np.float64) + t["center"]
        np.testing.assert_allclose(xyz, pts[ids], atol=1e-5)
        np.testing.assert_array_equal(t["instance_label"], labels[ids])
        seen += len(ids)
    assert seen > 0


def test_whole_plot_point_ids_identity():
    pts, labels, feats = _plot(n=2000)
    stream = TileStream(pts, labels, feats, inner_edge=8, outer_edge=13.5,
                        stride=0.5)
    batch = next(stream.whole_plot_batches(min_bucket=1 << 8))
    valid = batch["valid"]
    ids = batch["point_ids"][valid]
    # every original row appears exactly once
    assert sorted(ids) == list(range(len(pts)))
    np.testing.assert_allclose(batch["coords"][valid], pts[ids], atol=1e-5)


def test_ensemble_by_id_matches_coordinate_ensemble():
    rng = np.random.default_rng(1)
    base = np.round(rng.uniform(0, 10, (300, 3)), 2)
    # duplicate a third of the rows (overlapping tiles) with identical coords
    dup = rng.choice(300, 100, replace=False)
    coords = np.vstack([base, base[dup]])
    ids = np.concatenate([np.arange(300), dup])
    vals = rng.normal(size=(400, 2)).astype(np.float32)

    uids, mean_ids = ensemble_by_id(ids, vals)
    c_coords, mean_coords = __import__(
        "treelearn_tpu.pipeline.ensemble", fromlist=["ensemble"]).ensemble(
            coords, vals)
    assert len(uids) == 300
    # both paths order by key; map id order onto coordinate-key order
    from treelearn_tpu.pipeline.ensemble import quantize_keys

    keys = quantize_keys(base)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_allclose(mean_ids[order], mean_coords, atol=1e-5)


def test_ensemble_named_by_id_identity_fast_path():
    rng = np.random.default_rng(2)
    n = 128
    ids = rng.permutation(n)
    coords = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    logits = rng.normal(size=(n, 2)).astype(np.float32)
    sem = rng.integers(0, 2, n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    inst = rng.integers(0, 4, n)
    feats = rng.normal(size=(n, 0)).astype(np.float32)
    inf_ = rng.normal(size=(n, 1)).astype(np.float32)

    uids, c, ss, sl, op, ol, il, f, i_ = ensemble_named_by_id(
        ids, coords, logits, sem, offs, offs, inst, feats, inf_)
    np.testing.assert_array_equal(uids, np.arange(n))
    inv = np.argsort(ids)
    np.testing.assert_allclose(c, coords[inv], atol=1e-6)
    np.testing.assert_array_equal(sl, sem[inv])
    np.testing.assert_array_equal(il, inst[inv])


def test_id_scatter_equals_propagate_by_key():
    """The O(V) scatter the id path uses in run.py must agree with the
    quantized-key join it replaces."""
    rng = np.random.default_rng(3)
    vox = np.round(rng.uniform(0, 20, (500, 3)), 2)
    # predictions exist for a subset of voxels, in shuffled order
    sub = rng.choice(500, 400, replace=False)
    preds = rng.integers(0, 7, 400)

    by_key, not_found_key = propagate_by_key(vox[sub], preds, vox)

    scatter = np.full(len(vox), -1, np.int64)
    scatter[sub] = preds
    not_found = np.ones(len(vox), bool)
    not_found[sub] = False

    # coordinates may collide after rounding; compare only where the key join
    # found a unique source
    uniq_mask = ~not_found
    np.testing.assert_array_equal(not_found_key[~not_found & not_found_key],
                                  np.zeros(0, bool))  # scatter finds >= key
    agree = uniq_mask & ~not_found_key
    np.testing.assert_array_equal(scatter[agree] != -1,
                                  np.ones(agree.sum(), bool))
