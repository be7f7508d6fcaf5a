from .mesh import (  # noqa: F401
    make_dp_inference_step,
    make_dp_train_step,
    make_mesh,
    shard_batch_arrays,
)
