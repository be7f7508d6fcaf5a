"""Training: optimizer, LR schedule, jit-compiled train/eval steps.

Parity targets:
* optimizer/scheduler construction (reference util/train.py:105-122 +
  configs/training/train.yaml): AdamW(lr 3e-3, wd 1e-3) + timm-style cosine
  schedule (t_initial 1000 epochs, warmup 50 from 1e-5, floor 5e-5).
* the epoch loop semantics (reference tools/training/train.py:19-58): AMP
  (bf16 on TPU), global-norm grad clipping, per-epoch checkpointing.

The whole forward+backward+update is one jit program; BatchNorm state is
threaded functionally.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from .losses import point_wise_loss, total_loss


def make_epoch_cosine_schedule(cfg, steps_per_epoch: int):
    """timm CosineLRScheduler(t_in_epochs=True) equivalent as an optax
    step-indexed schedule: lr is a function of the epoch = step // spe."""
    base_lr = float(cfg["base_lr"])
    t_initial = int(cfg.get("t_initial", 1000))
    lr_min = float(cfg.get("lr_min", 5e-5))
    warmup_t = int(cfg.get("warmup_t", 0))
    warmup_lr_init = float(cfg.get("warmup_lr_init", 0.0))

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * (
            epoch / max(warmup_t, 1))
        # timm default warmup_prefix=False: cosine progress counts all epochs
        progress = jnp.clip(epoch / max(t_initial, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(epoch < warmup_t, warm, cos)

    return schedule


def build_optimizer(optim_cfg, scheduler_cfg=None, steps_per_epoch: int = 1,
                    grad_norm_clip: Optional[float] = None):
    """AdamW (or any optax alias) with optional cosine schedule + global-norm
    clip.  Note: the reference passes ``grad_norm_clip: True`` which torch
    interprets as max_norm=1.0; we mirror that."""
    cfg = dict(optim_cfg)
    opt_type = cfg.pop("type", "AdamW").lower()
    lr = cfg.pop("lr", 1e-3)
    if scheduler_cfg is not None:
        sched_cfg = dict(scheduler_cfg)
        sched_cfg["base_lr"] = lr
        lr = make_epoch_cosine_schedule(sched_cfg, steps_per_epoch)

    if opt_type == "adamw":
        opt = optax.adamw(lr, weight_decay=cfg.pop("weight_decay", 0.0), **cfg)
    elif opt_type == "adam":
        opt = optax.adam(lr, **cfg)
    elif opt_type == "sgd":
        opt = optax.sgd(lr, momentum=cfg.pop("momentum", 0.0), **cfg)
    else:
        raise ValueError(f"unsupported optimizer type: {opt_type}")

    chain = []
    if grad_norm_clip:
        clip = 1.0 if grad_norm_clip is True else float(grad_norm_clip)
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(opt)
    return optax.chain(*chain)


def loss_from_output(output, batch):
    sem_loss, off_loss = point_wise_loss(
        output["semantic_prediction_logits"],
        output["offset_predictions"],
        batch["masks_sem"] & batch["valid"],
        batch["masks_off"] & batch["valid"],
        batch["semantic_labels"],
        batch["offset_labels"],
    )
    return total_loss(sem_loss, off_loss)


def make_train_step(model, optimizer, *, batch_size: int, voxel_capacity: int,
                    compute_dtype=jnp.bfloat16, fast_conv=None,
                    level_capacities=None):
    """One jitted optimization step over a padded flat batch.

    ``fast_conv`` defaults to the slim ``"zeros"`` program on TPU: rulebooks
    are never materialized (the Pallas rd kernel supplies the banded spans
    directly — the 27-probe build cost ~220 ms/step at 512k voxels), and a
    banded-window overflow surfaces as ``loss_dict["_spans_ok"]`` with the
    whole update gated to a NO-OP in-program (params/state/opt_state pass
    through unchanged), so the host can re-dispatch the same batch on an
    exact ``fast_conv=True`` fallback step without losing anything.  The
    reference's analogue of this hazard is spconv's "reach zero!!!"
    crash-and-skip (reference util/pipeline.py:91-97).
    """
    if fast_conv is None and jax.default_backend() == "tpu":
        fast_conv = "zeros"

    from ..model.network import default_capacities

    caps = jnp.asarray(
        level_capacities if level_capacities is not None
        else default_capacities(voxel_capacity, model.num_blocks),
        dtype=jnp.int32)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch):
        def loss_fn(p):
            output, new_state = model.apply(
                p, state,
                batch["coords"], batch["input_feats"],
                batch["batch_ids"], batch["valid"],
                batch_size=batch_size, voxel_capacity=voxel_capacity,
                training=True, compute_dtype=compute_dtype,
                fast_conv=fast_conv, level_capacities=level_capacities,
            )
            loss, loss_dict = loss_from_output(output, batch)
            # reserved keys: host-side overflow guards, popped before logging
            loss_dict["_n_voxels_per_level"] = output["n_voxels_per_level"]
            if "spans_ok" in output:
                loss_dict["_spans_ok"] = output["spans_ok"]
            return loss, (new_state, loss_dict)

        (loss, (new_state, loss_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Gate the whole update to a no-op in-program when the forward was
        # invalid.  Two hazards: (a) banded-window overflow under the slim
        # zeros program (host re-dispatches on the exact fallback), (b) a
        # level overflowed its static voxel capacity, so the forward ran on a
        # truncated voxel set (host skips the batch — the training analog of
        # the reference's "reach zero!!!" tile skip, util/pipeline.py:91-97).
        # Gating in-program (not host rollback) matters because the inputs
        # are DONATED: their buffers are deleted after dispatch, so a host
        # restore of pre-step references would crash on the next step.
        ok = jnp.all(loss_dict["_n_voxels_per_level"] <= caps)
        loss_dict["_caps_ok"] = ok
        if "_spans_ok" in loss_dict:
            ok = ok & jnp.all(loss_dict["_spans_ok"])
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        new_params = keep(new_params, params)
        new_state = keep(new_state, state)
        new_opt_state = keep(new_opt_state, opt_state)
        return new_params, new_state, new_opt_state, loss, loss_dict

    return train_step


def make_eval_step(model, *, batch_size: int, voxel_capacity: int,
                   compute_dtype=jnp.float32, inner_capacity: Optional[int] = None,
                   need_backbone: bool = True, fast_conv=None,
                   level_capacities=None, level_windows=None):
    """Jitted forward step over one padded tile batch.

    With ``inner_capacity`` set, the step compacts its outputs to the
    inner-mask points on device before they ever leave HBM: the batch must
    then contain ``masks_inner``, and the step returns ``rows`` (original row
    indices of the kept points, -1 padded, stable order) plus f16 predictions
    gathered to those rows.  Per-tile D2H drops from O(padded capacity) to
    O(inner points) — on a tunneled device that transfer otherwise dominates
    the whole inference stage.  The caller sizes ``inner_capacity`` from the
    host-side mask counts, so overflow is impossible by construction (the
    ``n_keep`` output is an assertable witness).
    """

    @jax.jit
    def eval_step(params, state, batch):
        output, _ = model.apply(
            params, state,
            batch["coords"], batch["input_feats"],
            batch["batch_ids"], batch["valid"],
            batch_size=batch_size, voxel_capacity=voxel_capacity,
            training=False, compute_dtype=compute_dtype,
            fast_conv=fast_conv, level_capacities=level_capacities,
            level_windows=level_windows,
        )
        if inner_capacity is None:
            if not need_backbone:
                output = {k: v for k, v in output.items()
                          if k != "backbone_feats"}
            return output
        # NOTE: the selection is NOT shipped to the host — the host
        # recomputes the identical rows from its own copy of the masks
        # (np.flatnonzero(keep)[:inner_capacity]), saving the (N,) int32 D2H
        # on a tunnel that can drop to ~0.1 MB/s.  Compaction is a
        # cumsum+scatter (O(N)), not a sort: an argsort over the padded
        # capacity cost ~0.5 s/step at V=512k on v5e — several times the
        # U-Net it was post-processing.  Slots past n_keep hold row 0; the
        # host masks them out.
        keep = batch["masks_inner"] & batch["valid"]
        n = keep.shape[0]
        slot = jnp.where(keep, jnp.cumsum(keep) - 1, inner_capacity)
        idx = jnp.zeros((inner_capacity,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        # ONE packed f16 prediction array and ONE packed int32 meta array:
        # every np.asarray of a separate output is a tunnel round trip
        # (~25-30 ms RTT each), and the harvest fetched 5-7 of them per tile
        preds = [output["semantic_prediction_logits"][idx].astype(jnp.float16),
                 output["offset_predictions"][idx].astype(jnp.float16)]
        if need_backbone:
            preds.append(output["backbone_feats"][idx].astype(jnp.float16))
        meta = [jnp.sum(keep, dtype=jnp.int32).reshape(1),
                output["n_voxels"].astype(jnp.int32).reshape(1),
                output["n_voxels_per_level"].astype(jnp.int32),
                output["rule_nnz_per_level"].astype(jnp.int32)]
        if "spans_ok" in output:
            meta.append(output["spans_ok"].astype(jnp.int32))
        return {
            "preds_f16": jnp.concatenate(preds, axis=1),
            "meta_i32": jnp.concatenate(meta),
        }

    if inner_capacity is None:
        return eval_step

    n_levels = model.num_blocks

    def unpacked_step(params, state, batch):
        out = eval_step(params, state, batch)
        return _unpack_eval_outputs(out, n_levels, need_backbone,
                                    model.channels)

    unpacked_step.packed = eval_step
    return unpacked_step


def _unpack_eval_outputs(out, n_levels: int, need_backbone: bool,
                         channels: int):
    """Host-side view of the packed eval-step outputs — two device fetches
    total.  Returns the historical dict shape harvest consumes."""
    import numpy as np

    meta = np.asarray(out["meta_i32"])
    preds = out["preds_f16"]  # fetched lazily by harvest (np.asarray there)
    res = {
        "n_keep": meta[0],
        "n_voxels": meta[1],
        "n_voxels_per_level": meta[2:2 + n_levels],
        "rule_nnz_per_level": meta[2 + n_levels:2 + 2 * n_levels],
    }
    if len(meta) > 2 + 2 * n_levels:
        res["spans_ok"] = meta[2 + 2 * n_levels:].astype(bool)
    preds_np = np.asarray(preds)
    res["semantic_prediction_logits"] = preds_np[:, :2]
    res["offset_predictions"] = preds_np[:, 2:5]
    if need_backbone:
        res["backbone_feats"] = preds_np[:, 5:5 + channels]
    return res
