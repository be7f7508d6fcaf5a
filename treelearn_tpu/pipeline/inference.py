"""Batched pointwise inference over tiles.

Parity: get_pointwise_preds (reference util/pipeline.py:79-109) — forward every
tile, keep only inner-square points, un-center coordinates, concatenate.  The
reference's exception-skip for spconv shape collapse (pipeline.py:91-97) has no
equivalent failure mode here: shapes are static and downsampling drop rules are
masked scatters.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def get_pointwise_preds(model, params, state, dataloader, *, voxel_capacity: int,
                        compute_dtype=jnp.float32, logger=None):
    """Returns numpy arrays (semantic_logits, semantic_labels, offset_preds,
    offset_labels, coords, instance_labels, backbone_feats, input_feats) over
    all inner-mask points of all tiles."""
    from ..train.loop import make_eval_step

    step_cache: Dict[tuple, callable] = {}
    outs = {k: [] for k in ("semantic_prediction_logits", "semantic_labels",
                            "offset_predictions", "offset_labels", "coords",
                            "instance_labels", "backbone_feats", "input_feats")}

    for batch in dataloader:
        key = (batch["coords"].shape[0], batch["batch_size"])
        if key not in step_cache:
            step_cache[key] = make_eval_step(
                model, batch_size=batch["batch_size"],
                voxel_capacity=voxel_capacity, compute_dtype=compute_dtype)
            if logger:
                logger.info(f"compiling eval step for bucket {key}")
        eval_step = step_cache[key]

        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        output = eval_step(params, state, jbatch)

        keep = np.asarray(batch["masks_inner"] & batch["valid"])
        coords = np.asarray(batch["coords"]) + np.asarray(batch["centers"])

        outs["semantic_prediction_logits"].append(
            np.asarray(output["semantic_prediction_logits"])[keep])
        outs["offset_predictions"].append(
            np.asarray(output["offset_predictions"])[keep])
        outs["backbone_feats"].append(np.asarray(output["backbone_feats"])[keep])
        outs["semantic_labels"].append(np.asarray(batch["semantic_labels"])[keep])
        outs["offset_labels"].append(np.asarray(batch["offset_labels"])[keep])
        outs["coords"].append(coords[keep])
        outs["instance_labels"].append(np.asarray(batch["instance_labels"])[keep])
        outs["input_feats"].append(np.asarray(batch["input_feats"])[keep])

    cat = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    return (cat["semantic_prediction_logits"], cat["semantic_labels"],
            cat["offset_predictions"], cat["offset_labels"], cat["coords"],
            cat["instance_labels"], cat["backbone_feats"], cat["input_feats"])
