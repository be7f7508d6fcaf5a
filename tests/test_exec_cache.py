"""Executable disk cache (pipeline/inference.py::_exec_cache_*).

A fresh process pays trace + lower + compile + upload even with the XLA
persistent compile cache (it only skips backend_compile); the exec cache
serializes the compiled eval step itself.  These tests pin the contract:
round-trip via disk produces identical predictions, a corrupt artifact
falls back to compiling, a code-fingerprint change misses the cache, and
the LRU prune caps the directory.
"""

import os

import jax
import numpy as np
import pytest

from treelearn_tpu.model import TreeLearn
from treelearn_tpu.pipeline import inference as inf


def _loader(seed=0):
    rng = np.random.default_rng(seed)
    N, n_real = 2048, 1500
    coords = np.zeros((N, 3), np.float32)
    coords[:n_real] = rng.uniform([-8, -8, 0], [8, 8, 6],
                                  (n_real, 3)).astype(np.float32)
    valid = np.zeros(N, bool)
    valid[:n_real] = True
    return [{
        "coords": coords,
        "input_feats": np.ones((N, 1), np.float32),
        "batch_ids": np.zeros(N, np.int32),
        "valid": valid,
        "masks_inner": valid.copy(),
        "centers": np.zeros((N, 3), np.float32),
        "semantic_labels": np.zeros(N, np.int64),
        "offset_labels": np.zeros((N, 3), np.float32),
        "instance_labels": np.zeros(N, np.int64),
        "batch_size": 1,
    }]


@pytest.fixture
def fresh_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(inf, "_EXEC_CACHE_DIR", str(tmp_path))
    inf._PROCESS_STEP_CACHE.clear()
    inf._PURE_STEP_TIMINGS.clear()
    yield str(tmp_path)
    inf._PROCESS_STEP_CACHE.clear()
    inf._PURE_STEP_TIMINGS.clear()


def _run(model, params, state):
    return inf.get_pointwise_preds(model, params, state, _loader(),
                                   voxel_capacity=4096, timings={},
                                   need_backbone=False)


def test_exec_cache_roundtrip_identical_outputs(fresh_cache):
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))

    logits1 = _run(model, params, state)[0]
    arts = [f for f in os.listdir(fresh_cache) if f.endswith(".xc")]
    assert len(arts) == 1, "compile path must write one artifact"

    # simulate a fresh process: in-process step cache cleared, so the next
    # invocation must deserialize the artifact instead of compiling
    inf._PROCESS_STEP_CACHE.clear()
    mtime = os.path.getmtime(os.path.join(fresh_cache, arts[0]))
    logits2 = _run(model, params, state)[0]
    assert [f for f in os.listdir(fresh_cache) if f.endswith(".xc")] == arts, \
        "load path must not write a second artifact"
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               rtol=1e-5, atol=1e-6)


def test_exec_cache_corrupt_artifact_recompiles(fresh_cache):
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))
    logits1 = _run(model, params, state)[0]
    (art,) = [f for f in os.listdir(fresh_cache) if f.endswith(".xc")]
    with open(os.path.join(fresh_cache, art), "wb") as f:
        f.write(b"not a pickle")

    inf._PROCESS_STEP_CACHE.clear()
    logits2 = _run(model, params, state)[0]  # must fall back to compiling
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2),
                               rtol=1e-5, atol=1e-6)


def test_exec_cache_fingerprint_invalidates(fresh_cache, monkeypatch):
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))
    _run(model, params, state)
    assert len(os.listdir(fresh_cache)) == 1

    # a compute-path source edit changes the fingerprint -> different path,
    # so the stale executable cannot be loaded
    monkeypatch.setattr(inf, "_CODE_FPRINT", "deadbeefdeadbeef")
    inf._PROCESS_STEP_CACHE.clear()
    _run(model, params, state)
    assert len([f for f in os.listdir(fresh_cache)
                if f.endswith(".xc")]) == 2


def test_exec_cache_lru_prune(fresh_cache, monkeypatch):
    monkeypatch.setattr(inf, "_EXEC_CACHE_KEEP", 2)
    for i in range(3):
        p = os.path.join(fresh_cache, f"eval_fake{i}.xc")
        with open(p, "wb") as f:
            f.write(b"x")
        os.utime(p, (1000 + i, 1000 + i))

    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))
    _run(model, params, state)  # compiles (fakes are not its key) and saves
    left = sorted(f for f in os.listdir(fresh_cache) if f.endswith(".xc"))
    assert len(left) == 2, left
    assert "eval_fake0.xc" not in left and "eval_fake1.xc" not in left


def test_exec_cache_disabled_env(fresh_cache, monkeypatch):
    monkeypatch.setattr(inf, "_EXEC_CACHE_DIR", None)
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))
    _run(model, params, state)
    assert os.listdir(fresh_cache) == []


def test_exec_cache_fingerprint_covers_parallel(monkeypatch):
    """Every module an eval step can be traced through must be in the
    fingerprint set — parallel/mesh.py builds the DP inference step around
    the same program (VERDICT r4 item 6)."""
    import glob
    import hashlib

    monkeypatch.setattr(inf, "_CODE_FPRINT", None)
    root = os.path.dirname(os.path.abspath(inf.__file__))
    pkg = os.path.dirname(root)
    files = sorted(glob.glob(os.path.join(pkg, "ops", "*.py"))
                   + glob.glob(os.path.join(pkg, "model", "*.py"))
                   + glob.glob(os.path.join(pkg, "parallel", "*.py"))
                   + [os.path.join(pkg, "train", "loop.py")])
    assert any(os.path.join("parallel", "mesh.py") in f for f in files)
    h = hashlib.sha1()
    for p in files:
        with open(p, "rb") as f:
            h.update(f.read())
    assert inf._code_fingerprint() == h.hexdigest()[:16]
