"""Data-parallel paths on the forced 8-CPU virtual mesh (conftest.py):
DP training trajectory vs single device, DP pipeline inference vs single
device, DP collate, and optimizer-state checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treelearn_tpu.data.dataset import collate_dp, collate_padded
from treelearn_tpu.model import TreeLearn
from treelearn_tpu.parallel import (make_dp_inference_step, make_dp_train_step,
                                    make_mesh)
from treelearn_tpu.train.loop import build_optimizer, make_train_step

N_DEV = 8
pytestmark = pytest.mark.skipif(len(jax.devices()) < N_DEV,
                                reason="needs the 8-device CPU mesh")


def _tiny_model():
    return TreeLearn(channels=8, num_blocks=3, kernel_size=3, dim_coord=3,
                     dim_feat=1, use_coords=False, use_feats=False,
                     spatial_shape=[64, 64, 128], voxel_size=0.1)


def _crop_samples(n, pts=600, seed=0):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        xyz = rng.uniform(0, 5, (pts, 3)).astype(np.float32)
        samples.append({
            "coords": xyz,
            "input_feats": np.ones((pts, 1), np.float32),
            "semantic_labels": rng.integers(0, 2, pts).astype(np.int64),
            "offset_labels": rng.normal(size=(pts, 3)).astype(np.float32),
            "instance_labels": rng.integers(0, 4, pts).astype(np.int64),
            "centers": np.zeros((pts, 3), np.float32),
            "masks_inner": np.ones(pts, bool),
            "masks_sem": np.ones(pts, bool),
            "masks_off": np.ones(pts, bool),
        })
    return samples


def test_dp_train_matches_single_device_trajectory():
    """8 devices x 1 crop vs 1 device x 8 crops: identical global batch, the
    DP loss uses global normalizers, so trajectories agree (up to the BN
    batch-statistic partitioning, which is per-shard in DP)."""
    model = _tiny_model()
    params, state = model.init(jax.random.PRNGKey(0))
    opt_cfg = {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-3}

    samples = _crop_samples(8)
    bucket = 1 << 10

    # single-device run.  Flat level capacities: these random-uniform crops
    # barely shrink under downsampling (~4.7k voxels at EVERY level), so the
    # halve-per-level default would trip the in-program capacity gate
    # (train/loop.py) and freeze the trajectory into no-op updates
    opt1 = build_optimizer(dict(opt_cfg), grad_norm_clip=True, steps_per_epoch=1)
    step1 = make_train_step(model, opt1, batch_size=8, voxel_capacity=1 << 13,
                            compute_dtype=jnp.float32,
                            level_capacities=(1 << 13,) * 3)
    batch1 = collate_padded(samples, pad_to=bucket * 8)
    jb1 = {k: jnp.asarray(v) for k, v in batch1.items()
           if isinstance(v, np.ndarray)}
    p1, s1 = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
    o1 = opt1.init(p1)
    losses1 = []
    for _ in range(3):
        p1, s1, o1, loss, ld = step1(p1, s1, o1, jb1)
        assert bool(np.asarray(ld["_caps_ok"])), "capacity gate tripped"
        ld.pop("_n_voxels_per_level", None)
        losses1.append(float(loss))

    # DP run: same samples, one per device
    mesh = make_mesh(N_DEV)
    opt8 = build_optimizer(dict(opt_cfg), grad_norm_clip=True, steps_per_epoch=1)
    step8, _, _ = make_dp_train_step(model, opt8, mesh, batch_size=1,
                                     voxel_capacity=1 << 12,
                                     compute_dtype=jnp.float32)
    batch8 = collate_dp(samples, N_DEV, 1, pad_to=bucket)
    jb8 = {k: jnp.asarray(v) for k, v in batch8.items()
           if isinstance(v, np.ndarray)}
    p8, s8 = jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, state)
    o8 = opt8.init(p8)
    losses8 = []
    for _ in range(3):
        p8, s8, o8, loss, ld = step8(p8, s8, o8, jb8)
        assert ld["_n_voxels_per_level"].shape[-1] == 3
        losses8.append(float(loss))

    # same data, same global normalizers: only BN batch-stat partitioning
    # differs (global batch vs per-shard) -> close but not bit-equal
    np.testing.assert_allclose(losses8, losses1, rtol=0.08)
    assert losses8[-1] < losses8[0]
    assert losses1[-1] < losses1[0]


def test_dp_inference_matches_single_device():
    """The DP pipeline inference path returns the same pointwise predictions
    as the single-device path (eval mode -> running BN stats, deterministic)."""
    from treelearn_tpu.pipeline.inference import get_pointwise_preds

    model = _tiny_model()
    params, state = model.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(7)
    batches = []
    for i in range(5):  # not divisible by 8: exercises the padded tail group
        pts = 500
        xyz = rng.uniform(0, 5, (pts, 3)).astype(np.float32)
        sample = {
            "coords": xyz,
            "input_feats": np.ones((pts, 1), np.float32),
            "semantic_labels": rng.integers(0, 2, pts).astype(np.int64),
            "offset_labels": rng.normal(size=(pts, 3)).astype(np.float32),
            "instance_labels": rng.integers(0, 4, pts).astype(np.int64),
            "centers": np.full((pts, 3), i, np.float32),
            "masks_inner": np.ones(pts, bool),
            "masks_sem": np.ones(pts, bool),
            "masks_off": np.ones(pts, bool),
        }
        batches.append(collate_padded([sample], pad_to=1 << 10))

    single = get_pointwise_preds(model, params, state, iter(batches),
                                 voxel_capacity=1 << 11,
                                 compute_dtype=jnp.float32)
    mesh = make_mesh(N_DEV)
    dp = get_pointwise_preds(model, params, state, iter(batches),
                             voxel_capacity=1 << 11,
                             compute_dtype=jnp.float32, mesh=mesh)
    for a, b in zip(single, dp):
        if a is None or b is None:
            assert a is b  # point_ids: absent from both paths
            continue
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_collate_dp_layout():
    samples = _crop_samples(8, pts=100)
    out = collate_dp(samples, 4, 2, pad_to=256)
    assert out["coords"].shape == (4, 256, 3)
    assert out["valid"].shape == (4, 256)
    assert out["valid"].sum() == 800
    assert out["batch_size"] == 2
    assert out["n_samples"] == 8
    # shard 0 holds samples 0..1 with batch_ids 0 and 1
    assert set(np.unique(out["batch_ids"][0][out["valid"][0]])) == {0, 1}


def test_opt_state_checkpoint_roundtrip(tmp_path):
    from treelearn_tpu.model.checkpoint import (load_native_checkpoint,
                                                opt_state_from_flat,
                                                opt_state_to_flat,
                                                save_checkpoint)

    model = _tiny_model()
    params, state = model.init(jax.random.PRNGKey(2))
    opt = build_optimizer({"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-3},
                          grad_norm_clip=True, steps_per_epoch=1)
    step = make_train_step(model, opt, batch_size=2, voxel_capacity=1 << 11,
                           compute_dtype=jnp.float32)
    batch = collate_padded(_crop_samples(2, pts=300), pad_to=1 << 10)
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if isinstance(v, np.ndarray)}
    opt_state = opt.init(params)
    params, state, opt_state, _, _ = step(params, state, opt_state, jb)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, jax.device_get(params), jax.device_get(state),
                    opt_state_to_flat(jax.device_get(opt_state)), epoch=1)
    _, _, opt_flat, epoch = load_native_checkpoint(path)
    assert epoch == 1
    restored = opt_state_from_flat(opt_flat, opt.init(params))
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
