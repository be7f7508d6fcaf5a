"""Model forward, BN semantics, and checkpoint import/export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treelearn_tpu.model import TreeLearn, export_torch_state_dict, import_torch_state_dict
from treelearn_tpu.model.checkpoint import (
    flatten_tree,
    load_native_checkpoint,
    save_checkpoint,
    unflatten_tree,
)
from treelearn_tpu.train import point_wise_loss


def _small_model(num_blocks=2, channels=4):
    return TreeLearn(channels=channels, num_blocks=num_blocks, kernel_size=3,
                     dim_coord=3, dim_feat=1, use_coords=False, use_feats=False,
                     spatial_shape=[32, 32, 64], voxel_size=0.1)


def _batch(n=300, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 3.0, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    batch_ids = rng.integers(0, batch_size, n).astype(np.int32)
    valid = np.ones(n, bool)
    valid[-20:] = False
    return (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid))


def test_forward_shapes_and_masking():
    model = _small_model()
    params, state = model.init(jax.random.PRNGKey(0))
    coords, feats, batch_ids, valid = _batch()
    fwd = model.make_forward(batch_size=2, voxel_capacity=512)
    out, new_state = fwd(params, state, coords, feats, batch_ids, valid)
    assert out["semantic_prediction_logits"].shape == (300, 2)
    assert out["offset_predictions"].shape == (300, 3)
    assert out["backbone_feats"].shape == (300, 4)
    assert np.isfinite(np.asarray(out["semantic_prediction_logits"])).all()
    # eval mode: state unchanged
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_forward_train_updates_bn_state():
    model = _small_model()
    params, state = model.init(jax.random.PRNGKey(0))
    coords, feats, batch_ids, valid = _batch()
    out, new_state = model.apply(params, state, coords, feats, batch_ids, valid,
                                 batch_size=2, voxel_capacity=512, training=True)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(new_state))
    ]
    assert max(diffs) > 0


def test_forward_invariant_to_point_order():
    """Permuting input points must permute outputs identically (sparse engine
    must not depend on scan order beyond the documented first-k pooling —
    with use_coords=use_feats=False pooling is order-free)."""
    model = _small_model()
    params, state = model.init(jax.random.PRNGKey(1))
    coords, feats, batch_ids, valid = _batch(n=200)
    perm = np.random.default_rng(3).permutation(200)
    out1, _ = model.apply(params, state, coords, feats, batch_ids, valid,
                          batch_size=2, voxel_capacity=512)
    out2, _ = model.apply(params, state, coords[perm], feats[perm],
                          batch_ids[perm], valid[perm],
                          batch_size=2, voxel_capacity=512)
    np.testing.assert_allclose(
        np.asarray(out1["semantic_prediction_logits"])[perm],
        np.asarray(out2["semantic_prediction_logits"]), rtol=2e-4, atol=2e-5)


def test_native_checkpoint_roundtrip(tmp_path):
    model = _small_model()
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, state, epoch=7)
    p2, s2, _, epoch = load_native_checkpoint(path)
    assert epoch == 7
    for k, v in flatten_tree(params).items():
        np.testing.assert_array_equal(flatten_tree(p2)[k], np.asarray(v))
    for k, v in flatten_tree(state).items():
        np.testing.assert_array_equal(flatten_tree(s2)[k], np.asarray(v))


def test_torch_state_dict_roundtrip():
    """export -> import must be the identity on our trees (validates the
    spconv weight-layout conversion in both directions)."""
    model = _small_model(num_blocks=3)
    params, state = model.init(jax.random.PRNGKey(2))
    sd = export_torch_state_dict(params, state)
    # sanity: torch-style shapes
    w = sd["input_conv.0.weight"]
    assert w.shape == (4, 3, 3, 3, 4)
    assert "unet.blocks_tail.block0.i_branch.0.weight" in sd
    assert sd["unet.blocks_tail.block0.i_branch.0.weight"].shape == (4, 1, 1, 1, 8)

    p0, s0 = model.init(jax.random.PRNGKey(3))  # different values, same shapes
    sd_in = {k: (v.reshape(v.shape[0], v.shape[-1]) if ".i_branch." in k and v.ndim == 5 else v)
             for k, v in sd.items()}
    p2, s2, skipped = import_torch_state_dict(sd_in, p0, s0)
    assert skipped == []
    for k, v in flatten_tree(params).items():
        np.testing.assert_allclose(flatten_tree(p2)[k], np.asarray(v), rtol=1e-6)
    for k, v in flatten_tree(state).items():
        np.testing.assert_allclose(flatten_tree(s2)[k], np.asarray(v), rtol=1e-6)


def test_torch_pth_import(tmp_path):
    torch = pytest.importorskip("torch")
    from treelearn_tpu.model import load_checkpoint

    model = _small_model(num_blocks=2)
    params, state = model.init(jax.random.PRNGKey(4))
    sd = export_torch_state_dict(params, state)
    blob = {"net": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            "epoch": 12}
    path = str(tmp_path / "weights.pth")
    torch.save(blob, path)

    p0, s0 = model.init(jax.random.PRNGKey(5))
    p2, s2, epoch = load_checkpoint(path, p0, s0)
    assert epoch == 13
    for k, v in flatten_tree(params).items():
        np.testing.assert_allclose(flatten_tree(p2)[k], np.asarray(v), rtol=1e-6)


def test_point_wise_loss_masks():
    logits = jnp.asarray(np.random.randn(50, 2).astype(np.float32))
    offs = jnp.asarray(np.random.randn(50, 3).astype(np.float32))
    labels = jnp.asarray(np.random.randint(0, 2, 50))
    off_labels = jnp.asarray(np.random.randn(50, 3).astype(np.float32))
    empty = jnp.zeros(50, bool)
    full = jnp.ones(50, bool)

    sem, off = point_wise_loss(logits, offs, empty, empty, labels, off_labels)
    assert float(sem) == 0.0 and float(off) == 0.0

    sem, off = point_wise_loss(logits, offs, full, full, labels, off_labels)
    # numpy oracle
    p = np.asarray(jax.nn.log_softmax(logits))
    ce = -p[np.arange(50), np.asarray(labels)]
    np.testing.assert_allclose(float(sem), ce.mean(), rtol=1e-5)
    dist = np.linalg.norm(np.asarray(offs) - np.asarray(off_labels), axis=1)
    np.testing.assert_allclose(float(off), dist.mean(), rtol=1e-4)


def test_capacity_overflow_guard():
    """An over-capacity tile must raise CapacityOverflow instead of silently
    dropping voxels (the silent-truncation hazard of static shapes)."""
    import pytest

    from treelearn_tpu.model import TreeLearn
    from treelearn_tpu.model.network import CapacityOverflow, check_capacity

    model = TreeLearn(channels=4, num_blocks=2, kernel_size=3, dim_coord=3,
                      dim_feat=1, use_coords=False, use_feats=False,
                      spatial_shape=[64, 64, 64], voxel_size=0.1)
    params, state = model.init(jax.random.PRNGKey(0))

    # 4096 points on a 16x16x16 integer grid -> 4096 distinct voxels, but
    # capacity is only 512: n_voxels_per_level must report the overflow
    g = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"),
                 axis=-1).reshape(-1, 3).astype(np.float32) * 0.1 + 0.05
    n = len(g)
    out, _ = model.apply(params, state, jnp.asarray(g),
                         jnp.ones((n, 1), jnp.float32),
                         jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                         batch_size=1, voxel_capacity=512, training=False)
    with pytest.raises(CapacityOverflow):
        check_capacity(out, 512, 2, context="test: ")

    # same tile with enough capacity passes
    out, _ = model.apply(params, state, jnp.asarray(g),
                         jnp.ones((n, 1), jnp.float32),
                         jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                         batch_size=1, voxel_capacity=8192, training=False)
    check_capacity(out, 8192, 2, context="test: ")


def test_spans_overflow_guard():
    """check_capacity raises SpansOverflow when the slim zeros-fallback
    program flags a banded-window overflow (exactness guard)."""
    import numpy as np
    from treelearn_tpu.model.network import SpansOverflow, check_capacity

    ok = {"n_voxels_per_level": np.array([100, 50]),
          "spans_ok": np.array([True, True, True])}
    check_capacity(ok, 512, 2, context="test: ")

    bad = {"n_voxels_per_level": np.array([100, 50]),
           "spans_ok": np.array([True, False, True])}
    import pytest
    with pytest.raises(SpansOverflow):
        check_capacity(bad, 512, 2, context="test: ")


def test_rule_free_zeros_program_matches_xla(monkeypatch):
    """fast_conv='zeros' with rule-free plans (Pallas rd kernel, interpret
    mode) must reproduce the XLA rule path bit-for-bit when no span
    overflows, including rule_nnz accounting."""
    import treelearn_tpu.ops.pallas_conv as pconv
    import treelearn_tpu.ops.pallas_rd as prd

    monkeypatch.setattr(pconv, "_INTERPRET", True)
    monkeypatch.setattr(prd, "_INTERPRET", True)

    # capacity must admit the banded kernels (>= window, % tile == 0)
    model = TreeLearn(channels=4, num_blocks=2, kernel_size=3, dim_coord=3,
                      dim_feat=1, use_coords=False, use_feats=False,
                      spatial_shape=[64, 64, 64], voxel_size=0.1)
    params, state = model.init(3)
    rng = np.random.default_rng(5)
    n = 3000
    coords = rng.uniform(0, 6.0, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    batch_ids = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    args = (jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid))

    # capacity with headroom: uniform-random 3D data does not halve per
    # level (L1 keeps ~95% of L0's voxels), and a nearly-full level grid
    # legitimately trips the window-clip margin at the last tile
    cap = 16384
    out_ref, _ = model.apply(params, state, *args, batch_size=1,
                             voxel_capacity=cap, fast_conv=False)
    out_z, _ = model.apply(params, state, *args, batch_size=1,
                           voxel_capacity=cap, fast_conv="zeros")
    assert bool(np.asarray(out_z["spans_ok"]).all())
    np.testing.assert_array_equal(
        np.asarray(out_ref["rule_nnz_per_level"]),
        np.asarray(out_z["rule_nnz_per_level"]))
    # bf16 MXU one-hot gathers vs f32 XLA gathers: tolerance, not bit-equal
    np.testing.assert_allclose(
        np.asarray(out_ref["semantic_prediction_logits"]),
        np.asarray(out_z["semantic_prediction_logits"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_ref["offset_predictions"]),
        np.asarray(out_z["offset_predictions"]), atol=1e-4)


def test_rule_free_xla_fallback_program_matches(monkeypatch):
    """fast_conv=True with rule-free plans must match the pure-XLA program:
    the exact-XLA fallback branch builds its rule lazily via rule_thunk
    inside the cond (its correctness when taken is covered by the
    rule_conv_ad gradient-parity check in test_rule_conv_forms)."""
    import treelearn_tpu.ops.pallas_conv as pconv
    import treelearn_tpu.ops.pallas_rd as prd

    monkeypatch.setattr(pconv, "_INTERPRET", True)
    monkeypatch.setattr(prd, "_INTERPRET", True)

    model = TreeLearn(channels=4, num_blocks=2, kernel_size=3, dim_coord=3,
                      dim_feat=1, use_coords=False, use_feats=False,
                      spatial_shape=[64, 64, 64], voxel_size=0.1)
    params, state = model.init(3)
    rng = np.random.default_rng(5)
    n = 3000
    args = (jnp.asarray(rng.uniform(0, 6.0, (n, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool))
    cap = 16384
    out_ref, _ = model.apply(params, state, *args, batch_size=1,
                             voxel_capacity=cap, fast_conv=False)
    out_fast, _ = model.apply(params, state, *args, batch_size=1,
                              voxel_capacity=cap, fast_conv=True)
    np.testing.assert_allclose(
        np.asarray(out_ref["semantic_prediction_logits"]),
        np.asarray(out_fast["semantic_prediction_logits"]), atol=1e-4)
