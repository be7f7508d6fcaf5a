"""Pipeline stage units: ensembling, key propagation, tiles, hull, instances."""

import numpy as np

from treelearn_tpu.data.synthetic import make_synthetic_forest, verticality_proxy
from treelearn_tpu.pipeline import (
    HullRaster,
    compute_tile_grid,
    ensemble,
    get_instances,
    make_labels_consecutive,
    propagate_by_key,
)
from treelearn_tpu.config import ConfigDict


def test_ensemble_groupby_mean():
    coords = np.array([[0.111, 0.222, 0.333],
                       [0.112, 0.2201, 0.3304],   # same after rounding to 2dp
                       [1.0, 1.0, 1.0]])
    vals = np.array([[2.0], [4.0], [10.0]])
    out_coords, out_vals = ensemble(coords, vals)
    assert len(out_coords) == 2
    i = np.argmin(out_coords[:, 0])
    np.testing.assert_allclose(out_coords[i], [0.11, 0.22, 0.33], atol=1e-6)
    np.testing.assert_allclose(out_vals[i], [3.0])
    np.testing.assert_allclose(out_vals[1 - i], [10.0])


def test_ensemble_identity_fast_path():
    """All-unique rounded coords take the singleton fast path; output must
    match the general groupby ordering and values (multi-column arrays)."""
    rng = np.random.default_rng(7)
    coords = np.round(rng.uniform(0, 20, (500, 3)), 2)
    coords = np.unique(coords, axis=0)
    vals2 = rng.normal(size=(len(coords), 2)).astype(np.float32)
    vals1 = rng.normal(size=(len(coords),)).astype(np.float32)
    out_coords, o2, o1 = ensemble(coords, vals2, vals1)
    assert len(out_coords) == len(coords)
    # general path's output order is sorted-key order; verify by matching rows
    order = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    np.testing.assert_allclose(out_coords, coords[order], atol=1e-6)
    np.testing.assert_allclose(o2, vals2[order], atol=1e-6)
    np.testing.assert_allclose(o1, vals1[order], atol=1e-6)


def test_propagate_by_key():
    src = np.array([[0.1, 0.2, 0.3], [5.0, 5.0, 5.0]])
    vals = np.array([7, 9])
    tgt = np.array([[0.1001, 0.2, 0.2999], [5.0, 5.0, 5.0], [9.0, 9.0, 9.0]])
    out, missing = propagate_by_key(src, vals, tgt)
    np.testing.assert_array_equal(out[:2], [7, 9])
    assert missing.tolist() == [False, False, True]


def test_tile_grid_covers_plot():
    inner, outer = compute_tile_grid((0, 40), (0, 40), inner_edge=8,
                                     outer_edge=13.5, stride=0.5)
    # every inner square is inside its outer square with the context margin
    np.testing.assert_allclose(outer[:, 0], inner[:, 0] - 13.5)
    np.testing.assert_allclose(outer[:, 1], inner[:, 1] + 13.5)
    # stride 0.5 -> adjacent columns shifted by half the inner edge
    xs = np.unique(inner[:, 0])
    assert len(xs) > 1
    step = np.diff(xs).min()
    width = inner[0, 1] - inner[0, 0]
    np.testing.assert_allclose(step, width * 0.5, rtol=1e-5)
    # plot area [0,40]^2 fully covered by inner squares
    assert inner[:, 0].min() <= 0 + 1e-6 or outer[:, 0].min() < 0
    assert inner[:, 1].max() >= 40 - 1e-6 or outer[:, 1].max() > 40


def test_hull_raster_contains_and_buffer():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 20, (5000, 2))
    hull = HullRaster(pts, alpha=0.6)
    assert hull.contains(np.array([[10.0, 10.0]]))[0]
    assert not hull.contains(np.array([[40.0, 40.0]]))[0]
    # boundary buffer: point just inside the edge is near the boundary
    assert hull.within_boundary_buffer(np.array([[0.3, 10.0]]), 1.0)[0]
    assert not hull.within_boundary_buffer(np.array([[10.0, 10.0]]), 1.0)[0]


def test_make_labels_consecutive():
    labels = np.array([5, 5, 9, 2, 9])
    out, mapping = make_labels_consecutive(labels, start_num=1)
    np.testing.assert_array_equal(out, [2, 2, 3, 1, 3])
    assert mapping == {1: 2, 2: 5, 3: 9}


def test_get_instances_with_oracle_offsets():
    """Perfect semantics + offsets must recover the synthetic instances
    (validates filter -> cluster -> tau_min path end to end)."""
    data, positions = make_synthetic_forest(n_trees=8, extent=30,
                                            points_per_tree=400,
                                            ground_points=2000, seed=1)
    coords = data[:, :3].astype(np.float32)
    inst = data[:, 3].astype(np.int64)

    # oracle offsets: tree points point to their instance base
    offsets = np.zeros_like(coords)
    for t in range(1, inst.max() + 1):
        m = inst == t
        base = coords[m][coords[m][:, 2].argmin()]
        offsets[m] = base - coords[m]

    logits = np.zeros((len(coords), 2), np.float32)
    logits[:, 0] = np.where(inst > 0, 5.0, -5.0)   # tree class = 0
    logits[:, 1] = -logits[:, 0]
    vert = verticality_proxy(data).reshape(-1)

    grouping = ConfigDict.from_dict({
        "tree_conf_thresh": 0.5, "tau_vert": 0.6, "tau_off": 20.0,
        "tau_group": 0.3, "tau_min": 50, "use_hdbscan": False,
    })
    preds = get_instances(coords, offsets, logits, grouping, vert,
                          tree_class_in_dataset=0, non_trees_label=0,
                          not_assigned_label=-1, start_num_preds=1)

    # ground points stay non-tree
    assert (preds[inst == 0] == 0).all()
    # clustered tree points partition exactly into the true instances
    mask = preds > 0
    assert mask.sum() > 0.5 * (inst > 0).sum()
    pairs = {}
    for p, g in zip(preds[mask], inst[mask]):
        pairs.setdefault(p, set()).add(g)
    for p, gs in pairs.items():
        assert len(gs) == 1, f"pred {p} spans gt instances {gs}"
    assert len(pairs) == 8


def test_fill_occupancy_holes_matches_per_cell_loop():
    """The integral-image hole fill must reproduce the per-cell edge-clipped
    window rule exactly (reference data_preparation.py:571-586)."""
    from treelearn_tpu.pipeline.tiles import fill_occupancy_holes

    rng = np.random.default_rng(7)
    for k, thresh in [(1, 0.5), (2, 0.3), (3, 0.8)]:
        occ = (rng.random((23, 17)) < 0.35).astype(float)
        x_dim, y_dim = occ.shape
        expect = np.empty_like(occ)
        for i in range(x_dim):
            for j in range(y_dim):
                li, ui = max(i - k, 0), min(i + k + 1, x_dim)
                lj, uj = max(j - k, 0), min(j + k + 1, y_dim)
                window = occ[li:ui, lj:uj]
                expect[i, j] = occ[i, j] or (window.sum() / window.size
                                             >= thresh)
        got = fill_occupancy_holes(occ, k, thresh)
        np.testing.assert_array_equal(got, expect)


def test_logit_margin_equals_softmax_threshold():
    """The binary-head confidence gate in get_instances is the logit margin
    vs log-odds (pipeline/instances.py), replacing a float64 softmax over the
    whole plot; the two must agree exactly — including l0 == l1 knife-edge
    rows at thr 0.5 (margin 0 >= log(1) = 0 iff p = 0.5 >= 0.5)."""
    from treelearn_tpu.pipeline.instances import softmax_np

    rng = np.random.default_rng(0)
    logits = rng.normal(scale=4.0, size=(20000, 2)).astype(np.float32)
    logits[:64, 1] = logits[:64, 0]  # knife-edge ties
    for thr in (0.3, 0.5, 0.84):
        probs = softmax_np(np.asarray(logits, np.float64))
        ref = probs[:, 0] >= thr
        margin = (logits[:, 0].astype(np.float64)
                  - logits[:, 1].astype(np.float64))
        got = margin >= np.log(thr / (1.0 - thr))
        assert np.array_equal(ref, got), thr
