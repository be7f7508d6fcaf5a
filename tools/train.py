"""Training CLI: python tools/train.py --config configs/training/train.yaml

Parity: reference tools/training/train.py — epoch loop with
examples_per_epoch cap, per-epoch checkpointing, periodic validation
(semantic accuracy @ 0.5 confidence + offset loss).
"""

import os.path as osp
import sys
import time
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

TREE_CLASS_IN_DATASET = 0
TREE_CONF_THRESHOLD = 0.5


def train_epoch(config, epoch, train_step, params, state, opt_state,
                train_loader, logger, writer, fallback_step=None):
    import jax.numpy as jnp

    start = time.time()
    losses = defaultdict(list)
    seen = 0
    for i, batch in enumerate(train_loader, start=1):
        if config.examples_per_epoch < seen + batch["n_samples"]:
            break
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        params, state, opt_state, loss, loss_dict = train_step(
            params, state, opt_state, jbatch)
        caps_ok = loss_dict.pop("_caps_ok", None)
        spans_ok = loss_dict.pop("_spans_ok", None)
        counts = loss_dict.pop("_n_voxels_per_level", None)
        if caps_ok is not None and not bool(np.asarray(caps_ok)):
            # A level overflowed its static voxel capacity: the step ran on a
            # truncated voxel set, but the update was gated to a NO-OP
            # in-program (the inputs are donated, so a host-side rollback of
            # pre-step references would restore deleted buffers).  Skip the
            # crop — the training analog of the reference's bad-tile skip
            # (reference util/pipeline.py:91-97 "reach zero!!!" handler).
            lvl = np.asarray(counts) if counts is not None else "?"
            logger.warning(f"train epoch {epoch} batch {i}: voxel capacity "
                           f"overflow (per-level counts {lvl}); skipping "
                           "batch (update was a no-op in-program)")
            seen += batch["n_samples"]
            continue
        if spans_ok is not None and not bool(np.asarray(spans_ok).all()) \
                and fallback_step is not None:
            # the slim rule-free program overflowed a banded window: its
            # update was a no-op in-program, so re-dispatch the SAME batch
            # on the exact fast_conv=True fallback program (compiled lazily
            # on first overflow)
            logger.info(f"train epoch {epoch} batch {i}: banded-window "
                        "overflow; retrying on the exact fallback program")
            params, state, opt_state, loss, loss_dict = fallback_step()(
                params, state, opt_state, jbatch)
            loss_dict.pop("_spans_ok", None)
            loss_dict.pop("_caps_ok", None)
            loss_dict.pop("_n_voxels_per_level", None)
        for k, v in loss_dict.items():
            losses[k].append(float(v))
        seen += batch["n_samples"]

    epoch_time = time.time() - start
    avg = {k: sum(v) / len(v) for k, v in losses.items()}
    for k, v in avg.items():
        writer.add_scalar(f"train/{k}", v, epoch)
    log = f"[TRAINING] [{epoch}/{config.epochs}], time {epoch_time:.2f}s"
    for k, v in avg.items():
        log += f", {k}: {v:.2f}"
    logger.info(log)
    return params, state, opt_state


def validate(config, epoch, eval_step, params, state, val_loader, logger, writer):
    import jax.numpy as jnp

    from treelearn_tpu.eval import get_eval_components
    from treelearn_tpu.train import point_wise_loss

    logits_all, labels_all, off_pred_all, off_lab_all = [], [], [], []
    for batch in val_loader:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        output = eval_step(params, state, jbatch)
        keep = np.asarray(batch["masks_sem"] & batch["valid"])
        logits_all.append(np.asarray(output["semantic_prediction_logits"])[keep])
        labels_all.append(batch["semantic_labels"][keep])
        off_pred_all.append(np.asarray(output["offset_predictions"])[keep])
        off_lab_all.append(batch["offset_labels"][keep])

    logits = np.concatenate(logits_all)
    labels = np.concatenate(labels_all)
    off_pred = np.concatenate(off_pred_all)
    off_lab = np.concatenate(off_lab_all)

    masks_off = labels == TREE_CLASS_IN_DATASET
    _, offset_loss = point_wise_loss(
        jnp.asarray(logits), jnp.asarray(off_pred),
        jnp.ones(len(labels), bool), jnp.asarray(masks_off),
        jnp.asarray(labels), jnp.asarray(off_lab))

    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    tree_pred = probs[:, TREE_CLASS_IN_DATASET] >= TREE_CONF_THRESHOLD
    tree_mask = labels == TREE_CLASS_IN_DATASET
    tp, fp, tn, fn = get_eval_components(tree_pred, tree_mask)
    acc = (tp + tn) / max(tp + fp + fn + tn, 1)

    logger.info(f"[VALIDATION] [{epoch}/{config.epochs}] "
                f"val/semantic_acc {acc*100:.2f}, val/offset_loss {float(offset_loss):.3f}")
    writer.add_scalar("val/acc", 0.0 if np.isnan(acc) else acc, epoch)
    writer.add_scalar("val/Offset_MAE", float(offset_loss), epoch)


def main():
    import jax
    import jax.numpy as jnp

    from treelearn_tpu.config import get_args_and_cfg
    from treelearn_tpu.data import TreeDataset, build_dataloader
    from treelearn_tpu.logging_utils import init_train_logger
    from treelearn_tpu.model import TreeLearn, load_checkpoint
    from treelearn_tpu.model.checkpoint import (
        checkpoint_save, load_native_checkpoint, opt_state_from_flat,
        opt_state_to_flat)
    from treelearn_tpu.train.loop import build_optimizer, make_eval_step, make_train_step

    args, config = get_args_and_cfg()
    logger, writer = init_train_logger(config, args)

    model = TreeLearn(**config.model)
    params, state = model.init(int(config.get("seed", 0)))

    n_shards = 1
    mesh = None
    if args.dist:
        from treelearn_tpu.parallel import make_mesh

        mesh = make_mesh()
        n_shards = int(mesh.devices.size)
        logger.info(f"data-parallel training over {n_shards} devices "
                    f"(global batch = {config.dataloader.train.batch_size} "
                    f"x {n_shards})")

    steps_per_epoch = max(config.examples_per_epoch
                          // (config.dataloader.train.batch_size * n_shards), 1)
    optimizer = build_optimizer(config.optimizer, config.scheduler,
                                steps_per_epoch, config.get("grad_norm_clip"))

    train_set = TreeDataset(**config.dataset_train, logger=logger)
    val_set = TreeDataset(**config.dataset_test, logger=logger)
    train_loader = build_dataloader(train_set, training=True,
                                    n_shards=n_shards,
                                    **config.dataloader.train)
    val_loader = build_dataloader(val_set, training=False,
                                  **config.dataloader.test)

    start_epoch = 1
    if args.resume:
        logger.info(f"Resume from {args.resume}")
        params, state, start_epoch = load_checkpoint(args.resume, params, state, logger)
    elif config.get("pretrain"):
        logger.info(f"Load pretrain from {config.pretrain}")
        params, state, _ = load_checkpoint(config.pretrain, params, state, logger)

    opt_state = optimizer.init(params)
    if args.resume and args.resume.endswith(".npz"):
        # restore AdamW moments + LR-schedule step (parity: the reference
        # checkpoints {net, optimizer, epoch}, util/train.py:50-54)
        _, _, opt_flat, _ = load_native_checkpoint(args.resume)
        opt_state = opt_state_from_flat(opt_flat, opt_state)
        if opt_flat:
            logger.info("restored optimizer state from checkpoint")
    compute_dtype = jnp.bfloat16 if config.get("fp16") else jnp.float32
    voxel_capacity = int(config.get("voxel_capacity", 1 << 19))
    # optional per-level capacity schedule (config key `level_capacities`):
    # the halve-per-level default under-provisions on dense synthetic crops
    # (level 1 can keep ~57% of level-0 voxels); level_capacities[0] must
    # equal voxel_capacity
    lvl_caps = config.get("level_capacities")
    level_capacities = (tuple(int(c) for c in lvl_caps) if lvl_caps else None)
    fallback_cache = {}
    if mesh is not None:
        from treelearn_tpu.parallel import make_dp_train_step

        train_step, _, _ = make_dp_train_step(
            model, optimizer, mesh,
            batch_size=config.dataloader.train.batch_size,
            voxel_capacity=voxel_capacity, compute_dtype=compute_dtype,
            level_capacities=level_capacities)

        def fallback_step():
            if "step" not in fallback_cache:
                fallback_cache["step"], _, _ = make_dp_train_step(
                    model, optimizer, mesh,
                    batch_size=config.dataloader.train.batch_size,
                    voxel_capacity=voxel_capacity,
                    compute_dtype=compute_dtype, fast_conv=True,
                    level_capacities=level_capacities)
            return fallback_cache["step"]
    else:
        train_step = make_train_step(model, optimizer,
                                     batch_size=config.dataloader.train.batch_size,
                                     voxel_capacity=voxel_capacity,
                                     compute_dtype=compute_dtype,
                                     level_capacities=level_capacities)

        def fallback_step():
            if "step" not in fallback_cache:
                fallback_cache["step"] = make_train_step(
                    model, optimizer,
                    batch_size=config.dataloader.train.batch_size,
                    voxel_capacity=voxel_capacity,
                    compute_dtype=compute_dtype, fast_conv=True,
                    level_capacities=level_capacities)
            return fallback_cache["step"]
    # fast_conv=True: validation must be exact without the spans-ok retry
    # protocol (the slim "zeros" program needs its caller to re-dispatch on
    # span overflow; here we just embed the exact fallback branch)
    eval_step = make_eval_step(
        model, batch_size=config.dataloader.test.batch_size,
        voxel_capacity=voxel_capacity,
        fast_conv=True if jax.default_backend() == "tpu" else None,
        level_capacities=level_capacities)

    # profiling hook (SURVEY §5.1): TL_PROFILE=<dir> traces one epoch
    # (TL_PROFILE_EPOCH, default = the first trained epoch) with jax.profiler
    profile_dir = os.environ.get("TL_PROFILE")
    profile_epoch = int(os.environ.get("TL_PROFILE_EPOCH", start_epoch))

    logger.info("Training")
    for epoch in range(start_epoch, config.epochs + 1):
        tracing = profile_dir and epoch == profile_epoch
        if tracing:
            jax.profiler.start_trace(profile_dir)
        params, state, opt_state = train_epoch(
            config, epoch, train_step, params, state, opt_state,
            train_loader, logger, writer, fallback_step=fallback_step)
        if tracing:
            jax.block_until_ready(params)
            jax.profiler.stop_trace()
            logger.info(f"profiler trace for epoch {epoch} -> {profile_dir}")
        checkpoint_save(epoch, jax.device_get(params), jax.device_get(state),
                        config.work_dir,
                        opt_state_flat=opt_state_to_flat(jax.device_get(opt_state)),
                        save_freq=config.save_frequency)
        if config.validation_frequency and epoch % config.validation_frequency == 0:
            logger.info("Validation")
            validate(config, epoch, eval_step, params, state, val_loader,
                     logger, writer)
        writer.flush()


if __name__ == "__main__":
    main()
