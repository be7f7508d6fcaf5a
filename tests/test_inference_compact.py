"""Device-side inner-mask compaction parity (train/loop.py make_eval_step).

The compacted eval step must return exactly the rows the host-side
``masks_inner & valid`` filter would keep, in the same (stable) order, with
predictions matching the uncompacted step to f16 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from treelearn_tpu.model import TreeLearn
from treelearn_tpu.train.loop import make_eval_step


@pytest.fixture(scope="module")
def setup():
    N = 2048
    rng = np.random.default_rng(0)
    n_real = 1500
    coords = np.zeros((N, 3), np.float32)
    coords[:n_real] = rng.uniform([-8, -8, 0], [8, 8, 6], (n_real, 3)).astype(np.float32)
    coords[:n_real] = np.round(coords[:n_real] / 0.5) * 0.5
    valid = np.zeros(N, bool)
    valid[:n_real] = True
    inner = (np.max(np.abs(coords[:, :2]), axis=1) <= 4.0) & valid
    batch = {
        "coords": jnp.asarray(coords),
        "input_feats": jnp.ones((N, 1), jnp.float32),
        "batch_ids": jnp.zeros((N,), jnp.int32),
        "valid": jnp.asarray(valid),
        "masks_inner": jnp.asarray(inner),
    }
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state, batch, inner, valid


def test_compacted_matches_full(setup):
    model, params, state, batch, inner, valid = setup
    full_step = make_eval_step(model, batch_size=1, voxel_capacity=4096)
    full = full_step(params, state, batch)

    keep = inner & valid
    cap = 1024
    assert keep.sum() <= cap
    compact_step = make_eval_step(model, batch_size=1, voxel_capacity=4096,
                                  inner_capacity=cap)
    out = compact_step(params, state, batch)

    # rows are no longer shipped from the device: the host reproduces the
    # selection (stable argsort of ~keep) — this test validates that the
    # host-side reproduction indexes the device predictions correctly
    idx = np.argsort(~keep, kind="stable")[:cap]
    rows = np.where(keep[idx], idx, -1)
    sel = rows[rows >= 0]
    expected_rows = np.where(keep)[0]
    assert "rows" not in out
    assert int(out["n_keep"]) == keep.sum()
    np.testing.assert_array_equal(np.sort(sel), expected_rows)
    # stable order: rows ascend
    assert (np.diff(sel) > 0).all()

    got_logits = np.asarray(out["semantic_prediction_logits"],
                            np.float32)[rows >= 0]
    want_logits = np.asarray(full["semantic_prediction_logits"])[sel]
    np.testing.assert_allclose(got_logits, want_logits, rtol=5e-3, atol=5e-3)
    got_off = np.asarray(out["offset_predictions"], np.float32)[rows >= 0]
    want_off = np.asarray(full["offset_predictions"])[sel]
    np.testing.assert_allclose(got_off, want_off, rtol=5e-3, atol=5e-3)


def test_need_backbone_false_drops_key(setup):
    model, params, state, batch, inner, valid = setup
    step = make_eval_step(model, batch_size=1, voxel_capacity=4096,
                          inner_capacity=1024, need_backbone=False)
    out = step(params, state, batch)
    assert "backbone_feats" not in out
    step2 = make_eval_step(model, batch_size=1, voxel_capacity=4096,
                           need_backbone=False)
    assert "backbone_feats" not in step2(params, state, batch)


def test_get_pointwise_preds_compacted_pipeline(setup):
    """End-to-end through get_pointwise_preds with a two-batch loader."""
    from treelearn_tpu.pipeline.inference import get_pointwise_preds

    model, params, state, batch, inner, valid = setup
    N = valid.shape[0]
    host_batch = {
        "coords": np.asarray(batch["coords"]),
        "input_feats": np.asarray(batch["input_feats"]),
        "batch_ids": np.asarray(batch["batch_ids"]),
        "valid": valid,
        "masks_inner": inner,
        "centers": np.full((N, 3), 2.0, np.float32),
        "semantic_labels": np.arange(N, dtype=np.int64) % 2,
        "offset_labels": np.zeros((N, 3), np.float32),
        "instance_labels": np.arange(N, dtype=np.int64),
        "batch_size": 1,
    }
    loader = [host_batch, host_batch]
    tm = {}
    res = get_pointwise_preds(model, params, state, loader,
                              voxel_capacity=4096, timings=tm,
                              need_backbone=False)
    (logits, sem_labels, offsets, off_labels, coords, inst, backbone,
     in_feats, point_ids) = res
    assert point_ids is None  # loader carried no point_ids key
    n_keep = int((inner & valid).sum())
    assert len(logits) == 2 * n_keep
    assert backbone.shape == (2 * n_keep, 0)
    # labels/coords sliced from the host arrays by the device row indices
    np.testing.assert_array_equal(inst[:n_keep], np.where(inner & valid)[0])
    np.testing.assert_allclose(
        coords[:n_keep],
        np.asarray(batch["coords"])[inner & valid] + 2.0, rtol=1e-6)
    assert tm["steps"] == 2


def test_packed_output_unpack_roundtrip():
    """The packed (preds_f16, meta_i32) wire format must unpack to the
    historical output dict exactly."""
    import jax.numpy as jnp

    from treelearn_tpu.train.loop import _unpack_eval_outputs

    rng = np.random.default_rng(0)
    n_levels, channels, cap = 3, 4, 64
    logits = rng.normal(size=(cap, 2)).astype(np.float16)
    offs = rng.normal(size=(cap, 3)).astype(np.float16)
    bb = rng.normal(size=(cap, channels)).astype(np.float16)
    meta = np.concatenate([[7], [9], [10, 5, 3], [100, 50, 25], [1, 0, 1]])
    out = {"preds_f16": jnp.asarray(np.concatenate([logits, offs, bb], 1)),
           "meta_i32": jnp.asarray(meta.astype(np.int32))}
    r = _unpack_eval_outputs(out, n_levels, True, channels)
    assert int(r["n_keep"]) == 7 and int(r["n_voxels"]) == 9
    np.testing.assert_array_equal(r["n_voxels_per_level"], [10, 5, 3])
    np.testing.assert_array_equal(r["rule_nnz_per_level"], [100, 50, 25])
    np.testing.assert_array_equal(r["spans_ok"], [True, False, True])
    np.testing.assert_array_equal(r["semantic_prediction_logits"], logits)
    np.testing.assert_array_equal(r["offset_predictions"], offs)
    np.testing.assert_array_equal(r["backbone_feats"], bb)


def test_level_tile_window_constraints():
    from treelearn_tpu.model.blocks import level_tile_window

    for c in (4, 32, 64, 96, 128, 192, 224, 448):
        tile, window = level_tile_window(c)
        assert tile >= 128 and tile % 128 == 0
        assert window % 128 == 0
        # coverage ratio never drops below 3 (overflow margin; overflows
        # fall back exactly via the spans-ok flag)
        assert window / tile >= 3
