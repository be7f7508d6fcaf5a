"""Multi-chip parallelism: device meshes + data-parallel train/inference steps.

The reference has no working distributed path (its --dist flag is vestigial,
SURVEY.md §2.4; reference parser.py:11, util/train.py:128-130).  Here data
parallelism is a first-class design: each device owns an independent padded
point batch (crops are independent — the natural shard unit), the model runs
fully local per device via shard_map, and only the scalar loss normalization
and gradients cross ICI (one psum each).  The same machinery shards tile
streams for whole-plot inference.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.losses import LOSS_MULTIPLIER_SEMANTIC


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch_arrays(batch: dict, n_shards: int) -> dict:
    """Reshape a host batch of ``n_shards`` stacked per-device batches into
    leading-device-axis arrays: each value (D*P, ...) -> (D, P, ...)."""
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim >= 1:
            assert value.shape[0] % n_shards == 0, (key, value.shape, n_shards)
            out[key] = value.reshape(n_shards, value.shape[0] // n_shards,
                                     *value.shape[1:])
        else:
            out[key] = value
    return out


def make_dp_train_step(model, optimizer, mesh: Mesh, *, batch_size: int,
                       voxel_capacity: int, compute_dtype=jnp.bfloat16,
                       axis_name: str = "dp", fast_conv=None,
                       level_capacities=None):
    """Data-parallel train step via shard_map over the mesh.

    Batch arrays carry a leading device axis (D, P, ...): device d runs the
    full model on its local (P, ...) slice — no resharding of the sparse
    structures, since crops are independent.  The masked-mean losses are
    computed with *global* normalizers (psum of masked sums and counts), so the
    gradient is exactly the single-program gradient; gradients are then
    psum-averaged once over ICI.
    """
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))

    from ..model.network import default_capacities

    caps = jnp.asarray(
        level_capacities if level_capacities is not None
        else default_capacities(voxel_capacity, model.num_blocks),
        dtype=jnp.int32)

    def local_loss_terms(params, state, batch):
        output, new_state = model.apply(
            params, state,
            batch["coords"], batch["input_feats"],
            batch["batch_ids"], batch["valid"],
            batch_size=batch_size, voxel_capacity=voxel_capacity,
            training=True, compute_dtype=compute_dtype,
            # rule-free slim program (see make_train_step): a window
            # overflow on ANY shard gates the whole global update to a
            # no-op via the psum'd spans_ok flag below
            fast_conv=fast_conv if fast_conv is not None else (
                "zeros" if jax.default_backend() == "tpu" else None),
        )
        spans_ok = output.get("spans_ok")
        logits = output["semantic_prediction_logits"].astype(jnp.float32)
        offs = output["offset_predictions"].astype(jnp.float32)
        msem = (batch["masks_sem"] & batch["valid"]).astype(jnp.float32)
        moff = (batch["masks_off"] & batch["valid"]).astype(jnp.float32)

        labels = jnp.clip(batch["semantic_labels"], 0, 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        dist = jnp.sqrt(jnp.sum(jnp.square(
            offs - batch["offset_labels"].astype(jnp.float32)), axis=1) + 1e-12)

        sums = jnp.stack([(ce * msem).sum(), msem.sum(),
                          (dist * moff).sum(), moff.sum()])
        return sums, output["n_voxels_per_level"], spans_ok, new_state

    def step_fn(params, state, opt_state, batch):
        # shard_map delivers the sharded leading device axis as size 1: strip it
        batch = jax.tree.map(lambda x: x[0], batch)

        def loss_fn(p):
            sums, counts, spans_ok, new_state = local_loss_terms(
                p, state, batch)
            g = jax.lax.psum(sums, axis_name)
            sem_loss = jnp.where(g[1] > 0, g[0] / jnp.maximum(g[1], 1.0), 0.0)
            off_loss = jnp.where(g[3] > 0, g[2] / jnp.maximum(g[3], 1.0), 0.0)
            loss = sem_loss * LOSS_MULTIPLIER_SEMANTIC + off_loss
            loss_dict = {"semantic_loss": sem_loss * LOSS_MULTIPLIER_SEMANTIC,
                         "offset_loss": off_loss,
                         # worst shard drives the overflow guard
                         "_n_voxels_per_level":
                             jax.lax.pmax(counts, axis_name)}
            if spans_ok is not None:
                # per-flag AND over all shards: any shard's overflow
                # invalidates the pmean'd gradient everywhere
                loss_dict["_spans_ok"] = jax.lax.pmin(
                    spans_ok.astype(jnp.int32), axis_name).astype(bool)
            return loss, (new_state, loss_dict)

        (loss, (new_state, loss_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis_name)
        # BN states diverge per shard; average them (standard sync-free DP BN)
        new_state = jax.lax.pmean(new_state, axis_name)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # in-program no-op gate on capacity overflow (worst shard) and banded
        # span overflow — host never rolls back donated buffers (see
        # make_train_step in train/loop.py for the rationale)
        ok = jnp.all(loss_dict["_n_voxels_per_level"] <= caps)
        loss_dict["_caps_ok"] = ok
        if "_spans_ok" in loss_dict:
            ok = ok & jnp.all(loss_dict["_spans_ok"])
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_params = keep(new_params, params)
        new_state = keep(new_state, state)
        new_opt_state = keep(new_opt_state, opt_state)
        return new_params, new_state, new_opt_state, loss, loss_dict

    sharded_step = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch):
        return sharded_step(params, state, opt_state, batch)

    return train_step, replicated, sharded


def make_dp_inference_step(model, mesh: Mesh, *, batch_size: int,
                           voxel_capacity: int, compute_dtype=jnp.float32,
                           axis_name: str = "dp",
                           inner_capacity: int | None = None,
                           need_backbone: bool = True):
    """Tile-parallel inference: each device forwards its own tile batch.

    With ``inner_capacity`` the per-device outputs are compacted to the
    inner-mask rows on device before leaving HBM (same contract as
    make_eval_step's compaction — see train/loop.py)."""

    def fwd(params, state, batch):
        batch = jax.tree.map(lambda x: x[0], batch)
        output, _ = model.apply(
            params, state,
            batch["coords"], batch["input_feats"],
            batch["batch_ids"], batch["valid"],
            batch_size=batch_size, voxel_capacity=voxel_capacity,
            training=False, compute_dtype=compute_dtype,
            fast_conv=True if jax.default_backend() == "tpu" else None,
        )
        if inner_capacity is None:
            keys = ["semantic_prediction_logits", "offset_predictions",
                    "n_voxels_per_level", "rule_nnz_per_level"]
            if need_backbone:
                keys.append("backbone_feats")
            return {k: output[k][None] for k in keys}
        # rows not shipped: host recomputes the identical selection from its
        # own masks; cumsum+scatter compaction, not a sort (see
        # train/loop.py:make_eval_step)
        keep = batch["masks_inner"] & batch["valid"]
        n = keep.shape[0]
        slot = jnp.where(keep, jnp.cumsum(keep) - 1, inner_capacity)
        idx = jnp.zeros((inner_capacity,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        out = {
            "n_keep": jnp.sum(keep, dtype=jnp.int32),
            "semantic_prediction_logits":
                output["semantic_prediction_logits"][idx].astype(jnp.float16),
            "offset_predictions":
                output["offset_predictions"][idx].astype(jnp.float16),
            "n_voxels_per_level": output["n_voxels_per_level"],
            "rule_nnz_per_level": output["rule_nnz_per_level"],
        }
        if need_backbone:
            out["backbone_feats"] = output["backbone_feats"][idx].astype(jnp.float16)
        return {k: v[None] for k, v in out.items()}

    sharded_fwd = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded_fwd)
