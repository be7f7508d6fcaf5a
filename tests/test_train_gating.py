"""Rulebook-free training path: gradient parity + the spans-ok update gate.

The train step runs the slim fast_conv="zeros" program (no (27, V) rulebook
materialization — reference spconv builds+caches rulebooks inside the conv,
tree_learn/model/blocks.py:57); a banded-window overflow gates the whole
optimizer/BN update to a no-op in-program and the host re-dispatches on the
exact fallback program (tools/train.py::train_epoch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from treelearn_tpu.model.network import TreeLearn
from treelearn_tpu.train.loop import make_train_step


def _toy_inputs(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 6.0, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 1)).astype(np.float32)
    return (jnp.asarray(coords), jnp.asarray(feats),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool))


def test_rule_free_training_grad_parity(monkeypatch):
    """grad of the rule-free fast_conv='zeros' program == grad of the
    materialized-rule fast_conv=True program (interpret mode) — both run the
    same banded bf16 kernels on the fast path, so training needs no (27, V)
    rulebook.  A loose cosine check against the exact f32 XLA path guards
    structural bugs (bf16 kernels drift a few % through the deep U-Net, so
    elementwise comparison against f32 is not meaningful)."""
    import treelearn_tpu.ops.pallas_conv as pconv
    import treelearn_tpu.ops.pallas_rd as prd

    monkeypatch.setattr(pconv, "_INTERPRET", True)
    monkeypatch.setattr(prd, "_INTERPRET", True)

    model = TreeLearn(channels=4, num_blocks=2, kernel_size=3, dim_coord=3,
                      dim_feat=1, spatial_shape=[64, 64, 64], voxel_size=0.1)
    params, state = model.init(3)
    args = _toy_inputs()
    cap = 16384

    def loss(p, fast_conv, materialize):
        out, _ = model.apply(p, state, *args, batch_size=1,
                             voxel_capacity=cap, training=True,
                             fast_conv=fast_conv,
                             materialize_rules=materialize)
        if "spans_ok" in out:
            assert bool(np.asarray(out["spans_ok"]).all())
        return (jnp.sum(out["semantic_prediction_logits"] ** 2)
                + jnp.sum(out["offset_predictions"] ** 2))

    g_fast = jax.grad(lambda p: loss(p, True, True))(params)
    g_rf = jax.grad(lambda p: loss(p, "zeros", False))(params)
    g_exact = jax.grad(lambda p: loss(p, False, True))(params)

    flat_fast, _ = jax.tree_util.tree_flatten(g_fast)
    flat_rf, _ = jax.tree_util.tree_flatten(g_rf)
    flat_exact, _ = jax.tree_util.tree_flatten(g_exact)
    assert len(flat_fast) == len(flat_rf) == len(flat_exact)
    for a, b in zip(flat_fast, flat_rf):
        # identical kernels, identical numerics up to cond-branch plumbing
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5 * scale, rtol=1e-5)
    # structure check vs the exact f32 path: same global direction (per-leaf
    # cosine is noisy for small-norm leaves under bf16 kernels)
    av = np.concatenate([np.asarray(a).ravel() for a in flat_exact])
    bv = np.concatenate([np.asarray(b).ravel() for b in flat_rf])
    cos = float(av @ bv) / max(np.linalg.norm(av) * np.linalg.norm(bv), 1e-12)
    assert cos > 0.98, f"gradient direction diverged: cos={cos:.4f}"


class _StubModel:
    """model.apply stand-in emitting controllable spans_ok / voxel counts."""

    num_blocks = 1

    def __init__(self, spans_ok: bool = True, n_voxels: int = 1):
        self.spans_ok = spans_ok
        self.n_voxels = n_voxels

    def apply(self, p, state, coords, feats, bids, valid, **kw):
        # asymmetric logit columns so the CE gradient wrt w is nonzero
        pred = coords[:, :2] * p["w"] * jnp.array([1.0, 2.0])
        out = {
            "semantic_prediction_logits": pred,
            "offset_predictions": jnp.zeros((coords.shape[0], 3)),
            "n_voxels_per_level": jnp.array([self.n_voxels], jnp.int32),
            "spans_ok": jnp.array([self.spans_ok]),
        }
        return out, {"s": state["s"] + 1.0}


def _toy_batch(n=8):
    return {
        "coords": jnp.ones((n, 3)), "input_feats": jnp.ones((n, 1)),
        "batch_ids": jnp.zeros(n, jnp.int32), "valid": jnp.ones(n, bool),
        "masks_sem": jnp.ones(n, bool), "masks_off": jnp.ones(n, bool),
        "semantic_labels": jnp.zeros(n, jnp.int32),
        "offset_labels": jnp.zeros((n, 3)),
    }


@pytest.mark.parametrize("ok", [True, False])
def test_spans_overflow_noops_the_update(ok):
    """spans_ok=False must leave params, BN state, and optimizer state
    bit-identical (the host retries the batch on the fallback program)."""
    model = _StubModel(ok)
    opt = optax.adam(1e-2)
    step = make_train_step(model, opt, batch_size=1, voxel_capacity=64,
                           fast_conv="zeros")
    params = {"w": jnp.ones(())}
    state = {"s": jnp.zeros(())}
    opt_state = opt.init(params)
    mu0 = np.asarray(jax.tree_util.tree_leaves(opt_state)[1])
    batch = _toy_batch()
    new_p, new_s, new_o, loss, loss_dict = step(params, state, opt_state,
                                                batch)
    assert bool(np.asarray(loss_dict["_spans_ok"]).all()) == ok
    if ok:
        assert float(new_p["w"]) != 1.0
        assert float(new_s["s"]) == 1.0
    else:
        assert float(new_p["w"]) == 1.0
        assert float(new_s["s"]) == 0.0
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(new_o)[1]), mu0)


@pytest.mark.parametrize("overflow", [True, False])
def test_capacity_overflow_noops_the_update(overflow):
    """A capacity overflow must gate the update to a no-op IN-PROGRAM on the
    real jitted step (with donation active): the forward ran on a truncated
    voxel set, and the inputs are donated, so a host-side restore of the
    pre-step references would resurrect deleted buffers on TPU.  The step
    reports ``_caps_ok`` and leaves params/state/opt_state bit-identical."""
    model = _StubModel(spans_ok=True, n_voxels=999 if overflow else 3)
    opt = optax.adam(1e-2)
    step = make_train_step(model, opt, batch_size=1, voxel_capacity=64,
                           fast_conv="zeros")
    params = {"w": jnp.ones(())}
    state = {"s": jnp.zeros(())}
    opt_state = opt.init(params)
    new_p, new_s, new_o, loss, loss_dict = step(params, state, opt_state,
                                                _toy_batch())
    assert bool(np.asarray(loss_dict["_caps_ok"])) == (not overflow)
    if overflow:
        assert float(new_p["w"]) == 1.0
        assert float(new_s["s"]) == 0.0
    else:
        assert float(new_p["w"]) != 1.0
        assert float(new_s["s"]) == 1.0


def test_capacity_overflow_skips_batch():
    """train_epoch must skip a batch whose step reports _caps_ok=False (the
    step's update was a no-op in-program) and continue with the next batch —
    the training analog of the reference's bad-tile skip (reference
    util/pipeline.py:91-97).  No host-side rollback: the step's returned
    params ARE the truth (donation makes pre-step references unusable)."""
    import logging

    from tools.train import train_epoch

    calls = {"n": 0}

    def step(params, state, opt_state, jbatch):
        calls["n"] += 1
        overflow = calls["n"] == 2  # second batch blows level 0
        counts = np.array([999 if overflow else 3], np.int32)
        # the real step no-ops in-program on overflow; mimic that
        return (params if overflow else params + 1, state, opt_state, 0.1,
                {"semantic_loss": jnp.float32(0.1),
                 "_caps_ok": np.bool_(not overflow),
                 "_n_voxels_per_level": counts})

    class _Cfg(dict):
        __getattr__ = dict.__getitem__

    config = _Cfg({"examples_per_epoch": 3, "epochs": 1,
                   "voxel_capacity": 64, "model": _Cfg({"num_blocks": 1})})
    loader = [{"n_samples": 1, "x": np.zeros(1, np.float32)}
              for _ in range(3)]

    class _W:
        def add_scalar(self, *a):
            pass

    params, state, opt_state = train_epoch(
        config, 1, step, jnp.float32(0.0), None, None, loader,
        logging.getLogger("tl_test"), _W())
    # 3 batches ran; batch 2's update was a no-op
    assert calls["n"] == 3
    assert float(params) == 2.0
