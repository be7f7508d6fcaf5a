"""The MFU pure-step timing re-dispatch must run once per compiled program:
multi-plot serving (and the bench's steady passes) re-enter
``get_pointwise_preds`` with the same shapes and must not re-pay the ~2 s
triple re-dispatch (pipeline/inference.py::_PURE_STEP_TIMINGS)."""

import numpy as np
import jax
import pytest

from treelearn_tpu.model import TreeLearn
from treelearn_tpu.pipeline.inference import get_pointwise_preds


def _loader(seed):
    rng = np.random.default_rng(seed)
    N, n_real = 2048, 1500
    coords = np.zeros((N, 3), np.float32)
    coords[:n_real] = rng.uniform([-8, -8, 0], [8, 8, 6],
                                  (n_real, 3)).astype(np.float32)
    valid = np.zeros(N, bool)
    valid[:n_real] = True
    batch = {
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
    }
    return [batch]


@pytest.mark.parametrize("need_backbone", [False])
def test_pure_step_timing_cached_across_invocations(need_backbone):
    model = TreeLearn(voxel_size=0.5, use_coords=False, use_feats=False,
                      channels=4, num_blocks=2, spatial_shape=[64, 64, 64])
    params, state = model.init(jax.random.PRNGKey(0))

    tm1 = {}
    get_pointwise_preds(model, params, state, _loader(0),
                        voxel_capacity=4096, timings=tm1,
                        need_backbone=need_backbone)
    assert tm1.get("pure_step_s") is not None
    assert tm1["timing_rerun_s"] > 0.0  # first invocation measures

    tm2 = {}
    get_pointwise_preds(model, params, state, _loader(1),
                        voxel_capacity=4096, timings=tm2,
                        need_backbone=need_backbone)
    assert tm2["timing_rerun_s"] == 0.0  # cache hit: no re-dispatches
    assert tm2["pure_step_s"] == tm1["pure_step_s"]
