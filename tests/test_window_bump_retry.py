"""Window-bump retry on span overflow (pipeline/inference.py).

In whole-plot mode a measured window that turns out too small (host f32
boundary drift / an alignment flip) must NOT route into the exact-XLA
fallback — whose materialized (27, V) rules crashed the TPU worker at 4M
voxels — but re-run on a banded program with every window bumped one ladder
step.  The overflow is injected here (on CPU the default program is the
exact-conv one, which never overflows); the retried batch must produce
predictions identical to the clean run.
"""

import numpy as np
import pytest

from treelearn_tpu.model import TreeLearn, network
from treelearn_tpu.pipeline import inference as inf


def _loader(n_real=4000, N=8192, seed=0):
    rng = np.random.default_rng(seed)
    coords = np.zeros((N, 3), np.float32)
    coords[:n_real] = rng.uniform([-10, -10, 0], [10, 10, 8],
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


def _run(model, params, state, level_windows):
    out = inf.get_pointwise_preds(
        model, params, state, _loader(), voxel_capacity=8192,
        need_backbone=False, level_windows=level_windows)
    return out[0], out[2]  # logits, offsets


@pytest.mark.slow
def test_bump_retry_matches_clean_run(monkeypatch, tmp_path):
    import jax

    monkeypatch.setattr(inf, "_EXEC_CACHE_DIR", str(tmp_path))
    model = TreeLearn(voxel_size=0.25, use_coords=False, use_feats=False,
                      channels=8, num_blocks=2, spatial_shape=[128, 128, 64])
    params, state = model.init(jax.random.PRNGKey(0))

    inf._PROCESS_STEP_CACHE.clear()
    ref_logits, ref_off = _run(model, params, state, (512, 512))

    # inject one SpansOverflow: harvest must route through the bump branch
    # (banded program with windows one ladder step up), NOT the exact-XLA
    # fallback, and the retried outputs must match the clean run
    real_check = network.check_capacity
    calls = {"n": 0}

    def fake_check(output, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise network.SpansOverflow("injected")
        return real_check(output, *a, **kw)

    monkeypatch.setattr(network, "check_capacity", fake_check)
    inf._PROCESS_STEP_CACHE.clear()
    logits, off = _run(model, params, state, (512, 512))
    assert calls["n"] >= 2  # the bump branch re-validated its output

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(off), np.asarray(ref_off),
                               rtol=1e-4, atol=1e-5)
