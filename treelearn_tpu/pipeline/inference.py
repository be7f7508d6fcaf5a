"""Batched pointwise inference over tiles with double-buffered streaming.

Parity: get_pointwise_preds (reference util/pipeline.py:79-109) — forward every
tile, keep only inner-square points, un-center coordinates, concatenate.  The
reference's exception-skip for spconv shape collapse (pipeline.py:91-97) has no
equivalent failure mode here: shapes are static and downsampling drop rules are
masked scatters.

TPU-native structure: tile cutting + H2D transfer of batch t+1 runs on a
background thread while the device computes batch t, and host-side harvesting
of batch t's outputs happens after batch t+1 has been dispatched — inference
wall-clock is max(compute, host+transfer) per batch, not the sum.  Predictions
are compacted to the inner-mask points ON DEVICE (stable-sorted row gather in
the eval step) and shipped as f16, so per-tile D2H is O(inner points), not
O(padded capacity).  Eval steps are AOT-compiled per shape bucket; XLA's own
cost analysis provides the FLOPs for the MFU report.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = object()

# the only batch arrays the eval step consumes; everything else stays on the
# host (padded label arrays are megabytes per tile — never ship them)
_MODEL_INPUT_KEYS = ("coords", "input_feats", "batch_ids", "valid",
                     "masks_inner")

# process-wide compiled-step cache: keyed on the model's architecture
# fingerprint + bucket shapes, so repeated pipeline invocations in one
# process (multi-plot serving, the two-pass bench) reuse the uploaded
# executable instead of re-paying the tunnel upload (6-490 s observed)
_PROCESS_STEP_CACHE: Dict[tuple, callable] = {}
# (host params id, host state id, device) -> host refs + device copies
_PARAMS_DEVICE_CACHE: Dict[tuple, tuple] = {}
# step-cache key -> {"pure_step_s", "dispatch_rtt_s"}: the MFU pure-step
# measurement re-dispatches the full eval step 3x (~1.5-2.5 s through the
# tunnel) — pay it once per compiled program, not once per plot
_PURE_STEP_TIMINGS: Dict[tuple, dict] = {}

# Executable disk cache: the XLA *persistent compile cache* only skips
# backend_compile — a fresh process still pays trace + lower + cache-key +
# executable upload (measured 39-106 s for the whole-plot eval step through
# the tunnel, and the cross-process cache key is not even stable for this
# program).  Serializing the compiled executable itself
# (jax.experimental.serialize_executable) cuts a fresh process's first
# inference to deserialize (0.8 s) + first call (2.3 s).  Keyed on the step
# parameters AND a content hash of the compute-path sources, so editing any
# kernel invalidates the artifacts.  TL_EXEC_CACHE=0 disables.
_EXEC_CACHE_DIR = (os.environ.get("TL_EXEC_CACHE_DIR",
                                  os.path.expanduser("~/.cache/treelearn_exec"))
                   if os.environ.get("TL_EXEC_CACHE", "1") != "0" else None)
_EXEC_CACHE_KEEP = 8  # LRU file cap (~128 MB per whole-plot executable)
_CODE_FPRINT = None


def _code_fingerprint() -> str:
    """Content hash of every source file an eval-step program can be built
    through (ops/ + model/ + parallel/ + train/loop.py) — parallel/ included
    because the DP inference step (parallel/mesh.py) wraps the same program
    (VERDICT r4 item 6)."""
    global _CODE_FPRINT
    if _CODE_FPRINT is None:
        import glob
        import hashlib

        h = hashlib.sha1()
        osp = os.path
        root = osp.dirname(osp.dirname(osp.abspath(__file__)))
        files = sorted(glob.glob(osp.join(root, "ops", "*.py"))
                       + glob.glob(osp.join(root, "model", "*.py"))
                       + glob.glob(osp.join(root, "parallel", "*.py"))
                       + [osp.join(root, "train", "loop.py")])
        for p in files:
            with open(p, "rb") as f:
                h.update(f.read())
        _CODE_FPRINT = h.hexdigest()[:16]
    return _CODE_FPRINT


def _exec_cache_path(key: tuple) -> Optional[str]:
    if _EXEC_CACHE_DIR is None:
        return None
    import hashlib

    blob = repr((key, jax.__version__, jax.devices()[0].device_kind,
                 _code_fingerprint()))
    return os.path.join(
        _EXEC_CACHE_DIR,
        f"eval_{hashlib.sha1(blob.encode()).hexdigest()[:20]}.xc")


def _exec_cache_load(path: str):
    """Deserialize a compiled eval step; returns callable or raises."""
    import pickle

    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    # execution_devices must be pinned to the single device the program was
    # compiled for: the default (all client devices) mis-restores the device
    # assignment on a multi-device client (e.g. the 8-CPU test mesh) and the
    # loaded executable then demands 8-sharded args.
    compiled = deserialize_and_load(payload, in_tree, out_tree,
                                    execution_devices=[jax.devices()[0]])
    os.utime(path)  # LRU touch
    return lambda params, state, jbatch: compiled(params, state, jbatch)


def _exec_cache_save(path: str, compiled) -> None:
    """Best-effort write + LRU prune of the executable cache dir."""
    import pickle

    from jax.experimental.serialize_executable import serialize

    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload, in_tree, out_tree = serialize(compiled)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    os.replace(tmp, path)
    entries = sorted(
        (os.path.join(os.path.dirname(path), e)
         for e in os.listdir(os.path.dirname(path)) if e.endswith(".xc")),
        key=os.path.getmtime)
    for stale in entries[:-_EXEC_CACHE_KEEP]:
        try:
            os.remove(stale)
        except OSError:
            pass


def _pow2(x: int) -> int:
    return 1 << int(np.ceil(np.log2(max(int(x), 1))))


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _prefetch(loader: Iterable, depth: int = 2):
    """Run the loader (tile cutting + collate) on a background thread and
    device_put each batch, so H2D overlaps device compute."""
    q: queue.Queue = queue.Queue(maxsize=depth)

    def worker():
        try:
            for batch in loader:
                if isinstance(batch, tuple):  # pre-paired (device part, host part)
                    q.put(batch)
                else:
                    jbatch = {k: jax.device_put(np.asarray(batch[k]))
                              for k in _MODEL_INPUT_KEYS}
                    q.put((jbatch, batch))
            q.put(_SENTINEL)
        except BaseException as e:  # surface loader errors in the main thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _group_for_dp(dataloader: Iterable, n_dev: int):
    """Group equal-shape tile batches into device stacks (D, ...) for the
    data-parallel inference step; a trailing partial group is padded with
    all-invalid copies (static shapes; masked out at harvest)."""
    buf = []

    def flush(buf):
        while len(buf) < n_dev:
            dummy = dict(buf[0])
            dummy["valid"] = np.zeros_like(buf[0]["valid"])
            buf.append(dummy)
        stacked = {k: np.stack([b[k] for b in buf])
                   for k in _MODEL_INPUT_KEYS}
        return stacked, list(buf)

    for batch in dataloader:
        if buf and batch["coords"].shape != buf[0]["coords"].shape:
            yield flush(buf)
            buf = []
        buf.append(batch)
        if len(buf) == n_dev:
            yield flush(buf)
            buf = []
    if buf:
        yield flush(buf)


def _inner_count(batch) -> int:
    return int((np.asarray(batch["masks_inner"])
                & np.asarray(batch["valid"])).sum())


def _inner_cap_bucket(count: int, n: int) -> int:
    """Static inner-compaction capacity: at least N/8 (so most tiles share
    one compiled program), grown in power-of-two steps for dense tiles."""
    return min(_pow2(max(count, n // 8, 1)), n)


def get_pointwise_preds(model, params, state, dataloader, *, voxel_capacity: int,
                        compute_dtype=jnp.float32, logger=None,
                        timings: Optional[dict] = None, mesh=None,
                        need_backbone: bool = True, level_capacities=None,
                        level_windows=None):
    """Returns numpy arrays (semantic_logits, semantic_labels, offset_preds,
    offset_labels, coords, instance_labels, backbone_feats, input_feats,
    point_ids) over all inner-mask points of all tiles.  ``point_ids`` are
    the integer original-cloud row ids threaded through by id-aware loaders
    (pipeline/streaming.py), or None when the loader doesn't provide them.

    If ``timings`` is a dict it is filled with {"compile_s", "device_s",
    "points", "flops_per_step", "steps"} for the bench's MFU report.

    With ``mesh`` (a jax Mesh) tile batches are sharded over the mesh's
    devices and forwarded in parallel (parallel/mesh.py).

    ``need_backbone=False`` drops the 32-channel backbone features from the
    step outputs entirely (only the pointwise-results dump consumes them).
    """
    from ..train.loop import make_eval_step

    # commit params/state to the compute device(s) before lowering:
    # host-resident params would otherwise change the jit cache key (input
    # placement is part of the compiled program) and defeat the persistent
    # compile cache.  Under DP the shard_map expects them replicated over the
    # whole mesh, not resident on one device.
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, rep)
        state = jax.device_put(state, rep)
    else:
        dev = jax.devices()[0]
        # device-copy cache: multi-plot serving (and the bench's steady
        # passes) re-enters with the SAME host params every time — re-staging
        # ~11 MB of weights through the tunnel costs ~0.3 s per plot.  Keyed
        # on object identity with the host tree kept referenced so ids stay
        # valid.
        key = (id(params), id(state), repr(dev))
        hit = _PARAMS_DEVICE_CACHE.get(key)
        if hit is not None and hit[0] is params and hit[1] is state:
            params, state = hit[2], hit[3]
        else:
            dparams = jax.device_put(params, dev)
            dstate = jax.device_put(state, dev)
            _PARAMS_DEVICE_CACHE.clear()  # one live entry: bound memory
            _PARAMS_DEVICE_CACHE[key] = (params, state, dparams, dstate)
            params, state = dparams, dstate

    step_cache = _PROCESS_STEP_CACHE
    outs = {k: [] for k in ("semantic_prediction_logits", "semantic_labels",
                            "offset_predictions", "offset_labels", "coords",
                            "instance_labels", "backbone_feats", "input_feats")}
    tm = timings if timings is not None else {}
    tm.setdefault("compile_s", 0.0)
    tm.setdefault("device_s", 0.0)
    tm.setdefault("points", 0)
    tm.setdefault("steps", 0)
    tm.setdefault("flops_per_step", 0.0)

    from ..model.network import (CapacityOverflow, SpansOverflow,
                                 check_capacity, default_capacities)

    fallback_cache: Dict[tuple, callable] = {}

    import os as _os
    _prof = _os.environ.get("TL_INFER_PROFILE")
    _tlog = ((lambda m: print(f"[infer] {m}", file=__import__('sys').stderr,
                              flush=True))
             if _prof else (lambda m: None))
    _t0 = time.time()


    def _rerun_with_fallback(batch, inner_cap):
        """A rulebook overflowed its banded windows under the slim program.

        With measured ``level_windows`` (whole-plot mode) the overflow means
        the host span mirror under-sized a window (f32 boundary drift / an
        alignment flip): re-run on a banded program with every window bumped
        one ladder step — still the fast kernel, and safe at any capacity.
        Without measured windows (tile mode), or if the bump overflows too,
        use the exact-XLA-fallback program — but never at giant capacity,
        where its materialized (27, V) rules are what crashed the TPU worker
        (round-5 10M probe)."""
        jbatch = {k: jax.device_put(np.asarray(batch[k]))
                  for k in _MODEL_INPUT_KEYS}
        if level_windows is not None:
            from .windows import bump_windows

            bumped = bump_windows(level_windows, level_capacities,
                                  voxel_capacity)
            key = ("bump", batch["coords"].shape[0], batch["batch_size"],
                   inner_cap, bumped)
            if key not in fallback_cache:
                if logger:
                    logger.info(f"span overflow: retrying with bumped "
                                f"windows {bumped}")
                fallback_cache[key] = make_eval_step(
                    model, batch_size=batch["batch_size"],
                    voxel_capacity=voxel_capacity,
                    compute_dtype=compute_dtype, inner_capacity=inner_cap,
                    need_backbone=need_backbone,
                    level_capacities=level_capacities, level_windows=bumped)
            out = fallback_cache[key](params, state, jbatch)
            # make_eval_step's callable already unpacks its packed outputs
            try:
                check_capacity(out, voxel_capacity, model.num_blocks,
                               context="inference batch (bumped windows): ",
                               level_capacities=level_capacities)
                return out
            except SpansOverflow:
                if voxel_capacity >= (1 << 21):
                    raise RuntimeError(
                        "span overflow persists after a window bump at "
                        f"capacity {voxel_capacity}; the exact-XLA fallback "
                        "is unsafe at this scale — re-run with "
                        "whole_plot: false (tile mode)")
        key = (batch["coords"].shape[0], batch["batch_size"], inner_cap)
        if key not in fallback_cache:
            if logger:
                logger.info(f"span overflow: compiling fallback step {key}")
            fallback_cache[key] = make_eval_step(
                model, batch_size=batch["batch_size"],
                voxel_capacity=voxel_capacity, compute_dtype=compute_dtype,
                inner_capacity=inner_cap, need_backbone=need_backbone,
                fast_conv=True, level_capacities=level_capacities,
                level_windows=level_windows)
        return fallback_cache[key](params, state, jbatch)

    def _rerun_with_capacity(batch, inner_cap, counts):
        """A level's true active-voxel count exceeded its static capacity
        (possible when the caller tight-sized ``level_capacities`` with small
        headroom, e.g. whole-plot mode's host-mirrored counts): re-run on a
        program whose capacities are grown from the TRUE counts (the model
        reports pre-truncation counts) with 25% headroom, rounded up to 4096
        multiples to bound compile diversity.  Mirrors the SpansOverflow
        fallback instead of hard-crashing the run."""
        grown = [int(np.ceil(int(c) * 1.25 / 4096)) * 4096 for c in counts]
        base_caps = (level_capacities if level_capacities is not None
                     else default_capacities(voxel_capacity, model.num_blocks))
        new_caps = tuple(max(g, int(c)) for g, c in zip(grown, base_caps))
        new_vcap = new_caps[0]
        key = ("caps", batch["coords"].shape[0], batch["batch_size"],
               inner_cap, new_caps)
        if key not in fallback_cache:
            if logger:
                logger.info(f"capacity overflow (counts {list(counts)}): "
                            f"compiling grown-capacity step {new_caps}")
            fallback_cache[key] = make_eval_step(
                model, batch_size=batch["batch_size"],
                voxel_capacity=new_vcap, compute_dtype=compute_dtype,
                inner_capacity=inner_cap, need_backbone=need_backbone,
                fast_conv=True, level_capacities=new_caps,
                level_windows=level_windows)
        jbatch = {k: jax.device_put(np.asarray(batch[k]))
                  for k in _MODEL_INPUT_KEYS}
        output = fallback_cache[key](params, state, jbatch)
        # grown caps came from true counts + headroom — a second overflow
        # means the counts themselves are unstable; surface it
        check_capacity(output, new_vcap, model.num_blocks,
                       context="inference batch (grown-capacity retry): ",
                       level_capacities=new_caps)
        return output

    def harvest(output, batch, inner_cap):
        _th = time.time()
        if "preds_f16" in output:
            # packed eval-step outputs: exactly two device fetches
            from ..train.loop import _unpack_eval_outputs

            output = _unpack_eval_outputs(output, model.num_blocks,
                                          need_backbone, model.channels)
        try:
            check_capacity(output, voxel_capacity, model.num_blocks,
                           context="inference batch: ",
                           level_capacities=level_capacities)
        except SpansOverflow:
            output = _rerun_with_fallback(batch, inner_cap)
        except CapacityOverflow:
            output = _rerun_with_capacity(
                batch, inner_cap, np.asarray(output["n_voxels_per_level"]))
        counts = np.asarray(output["n_voxels_per_level"])
        _tlog(f"  first sync (compute+counts) {time.time()-_th:.2f}s")
        prev = tm.get("n_vox_levels")
        tm["n_vox_levels"] = (counts if prev is None
                              else np.maximum(prev, counts))
        if "rule_nnz_per_level" in output:
            nnz = np.asarray(output["rule_nnz_per_level"])
            prev = tm.get("rule_nnz")
            tm["rule_nnz"] = nnz if prev is None else np.maximum(prev, nnz)
        n_keep = int(np.asarray(output["n_keep"]))
        _tlog(f"  scalars done {time.time()-_th:.2f}s")
        if n_keep > inner_cap:  # unreachable: cap sized from the same masks
            raise RuntimeError(
                f"inner compaction overflow: {n_keep} > {inner_cap}")
        # reproduce the device's compaction selection from the host-side
        # masks instead of shipping the (N,) rows array over the slow D2H
        # direction: the device packs keep rows in original order (cumsum+
        # scatter, train/loop.py:make_eval_step), so the selection is simply
        # the first inner_cap set bits
        keep = np.asarray(batch["masks_inner"]) & np.asarray(batch["valid"])
        sel = np.flatnonzero(keep)[:inner_cap]
        got = np.zeros(inner_cap, bool)
        got[:len(sel)] = True
        coords = np.asarray(batch["coords"])[sel] + np.asarray(batch["centers"])[sel]
        outs["semantic_prediction_logits"].append(
            np.asarray(output["semantic_prediction_logits"],
                       np.float32)[got])
        _tlog(f"  logits fetched {time.time()-_th:.2f}s")
        outs["offset_predictions"].append(
            np.asarray(output["offset_predictions"], np.float32)[got])
        _tlog(f"  offsets fetched {time.time()-_th:.2f}s")
        if need_backbone:
            outs["backbone_feats"].append(
                np.asarray(output["backbone_feats"], np.float32)[got])
        else:
            outs["backbone_feats"].append(np.zeros((len(sel), 0), np.float32))
        outs["semantic_labels"].append(np.asarray(batch["semantic_labels"])[sel])
        outs["offset_labels"].append(np.asarray(batch["offset_labels"])[sel])
        outs["coords"].append(coords)
        outs["instance_labels"].append(np.asarray(batch["instance_labels"])[sel])
        outs["input_feats"].append(np.asarray(batch["input_feats"])[sel])
        if "point_ids" in batch:
            # original-cloud row ids (host-only key, never shipped to the
            # device): lets the caller ensemble/propagate by integer id
            outs.setdefault("point_ids", []).append(
                np.asarray(batch["point_ids"])[sel])
        _tlog(f"harvest took {time.time()-_th:.2f}s")

    if mesh is not None:
        from ..parallel.mesh import make_dp_inference_step

        n_dev = int(mesh.devices.size)
        if logger:
            logger.info(f"data-parallel inference over {n_dev} devices")
        dp_cache: Dict[tuple, callable] = {}
        pending = None  # (output_device, [host shard batches], inner_cap)
        for stacked, shards in _prefetch(_group_for_dp(dataloader, n_dev)):
            n = shards[0]["coords"].shape[0]
            inner_cap = _inner_cap_bucket(
                max(_inner_count(s) for s in shards), n)
            key = (n, shards[0]["batch_size"], inner_cap)
            if key not in dp_cache:
                if logger:
                    logger.info(f"compiling DP eval step for bucket {key}")
                t0 = time.time()
                dp_cache[key] = make_dp_inference_step(
                    model, mesh, batch_size=shards[0]["batch_size"],
                    voxel_capacity=voxel_capacity, compute_dtype=compute_dtype,
                    inner_capacity=inner_cap, need_backbone=need_backbone)
                tm["compile_s"] += time.time() - t0
            t0 = time.time()
            output = dp_cache[key](params, state, stacked)
            tm["steps"] += 1
            tm["points"] += sum(int(np.asarray(s["valid"]).sum()) for s in shards)
            if pending is not None:
                out_prev, shards_prev, cap_prev = pending
                out_np = {k: np.asarray(v) for k, v in out_prev.items()}
                for d, shard in enumerate(shards_prev):
                    harvest({k: v[d] for k, v in out_np.items()}, shard,
                            cap_prev)
            pending = (output, shards, inner_cap)
            tm["device_s"] += time.time() - t0
        if pending is not None:
            t0 = time.time()
            out_prev, shards_prev, cap_prev = pending
            out_np = {k: np.asarray(v) for k, v in out_prev.items()}
            for d, shard in enumerate(shards_prev):
                harvest({k: v[d] for k, v in out_np.items()}, shard, cap_prev)
            tm["device_s"] += time.time() - t0
        cat = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
        return (cat["semantic_prediction_logits"], cat["semantic_labels"],
                cat["offset_predictions"], cat["offset_labels"], cat["coords"],
                cat["instance_labels"], cat["backbone_feats"],
                cat["input_feats"], cat.get("point_ids"))

    pending = None  # (output_device, host_batch, inner_cap)
    last_dispatch = None  # (eval_step, jbatch) for the pure-step timing
    for jbatch, batch in _prefetch(dataloader):
        _tlog(f"batch arrived +{time.time()-_t0:.2f}s")
        n = batch["coords"].shape[0]
        inner_cap = _inner_cap_bucket(_inner_count(batch), n)
        key = (model.config_key(), voxel_capacity, level_capacities,
               level_windows, str(compute_dtype),
               need_backbone, n, batch["batch_size"], inner_cap)
        if key not in step_cache:
            t0 = time.time()
            step = None
            validated = False
            exec_path = _exec_cache_path(key)
            if exec_path and os.path.isfile(exec_path):
                try:
                    step = _exec_cache_load(exec_path)
                    # first call validates INSIDE the fallback: a stale or
                    # foreign artifact can deserialize fine and still fail
                    # at execute (device-assignment mismatch)
                    jax.block_until_ready(step(params, state, jbatch))
                    validated = True
                    if logger:
                        logger.info(f"eval step for bucket {key[-3:]} loaded "
                                    f"from executable cache "
                                    f"({time.time()-t0:.1f}s)")
                except Exception as e:  # stale/foreign artifact: recompile
                    if logger:
                        logger.info(f"executable cache load failed "
                                    f"({type(e).__name__}: {e}); compiling")
                    step = None
            if step is None:
                if logger:
                    logger.info(f"compiling eval step for bucket {key[-3:]}")
                built = make_eval_step(model, batch_size=batch["batch_size"],
                                       voxel_capacity=voxel_capacity,
                                       compute_dtype=compute_dtype,
                                       inner_capacity=inner_cap,
                                       need_backbone=need_backbone,
                                       level_capacities=level_capacities,
                                       level_windows=level_windows)
                # AOT lower+compile of the PACKED program, then call the
                # Compiled directly — the jit __call__ is never used, which
                # sidesteps the jax-0.9 hoisted-constant cache poisoning
                # that forbade mixing AOT with jit dispatch, and hands us
                # the executable object to serialize into the disk cache.
                inner = getattr(built, "packed", built)
                compiled = inner.lower(params, state, jbatch).compile()
                step = (lambda c: lambda p, s, b: c(p, s, b))(compiled)
                if exec_path:
                    try:
                        _exec_cache_save(exec_path, compiled)
                    except Exception as e:  # cache write is best-effort
                        if logger:
                            logger.info(f"executable cache save failed: "
                                        f"{type(e).__name__}: {e}")
            if not validated:
                jax.block_until_ready(step(params, state, jbatch))
            dt = time.time() - t0
            tm["compile_s"] += dt
            if logger:
                logger.info(f"eval step for bucket {key[-3:]} ready "
                            f"in {dt:.1f}s")
            step_cache[key] = step
        eval_step = step_cache[key]

        _tlog(f"step ready +{time.time()-_t0:.2f}s")
        t0 = time.time()
        output = eval_step(params, state, jbatch)  # async dispatch
        tm["steps"] += 1
        tm["points"] += int(np.asarray(batch["valid"]).sum())
        if pending is not None:
            harvest(*pending)  # blocks on t-1 while the device runs t
        pending = (output, batch, inner_cap)
        last_dispatch = (eval_step, jbatch, key)
        tm["device_s"] += time.time() - t0  # dispatch + overlapped harvest
        _tlog(f"dispatched +{time.time()-_t0:.2f}s")
    if pending is not None:
        t0 = time.time()
        harvest(*pending)
        tm["device_s"] += time.time() - t0
        _tlog(f"final harvest done +{time.time()-_t0:.2f}s")
    if timings is not None and last_dispatch is not None:
        # pure device step time (no host transfer) for the MFU report:
        # device_s above includes D2H, which on a tunneled chip can dwarf
        # the compute it measures.  One re-dispatch of an identical batch is
        # unreliable both ways on a tunneled chip (server-side dedup can
        # no-op it; a tunnel stall can triple it) — so: min of 3 dispatches
        # with input perturbations that keep shapes/programs identical,
        # minus the measured dispatch round-trip (the profiling discipline
        # of docs/performance.md / scripts/profile_step.py::timeit).
        step, jbatch, skey = last_dispatch
        cached = _PURE_STEP_TIMINGS.get(skey)
        if cached is not None:
            # measured once for this compiled program (multi-plot serving /
            # steady bench passes): reuse, no re-dispatch cost
            tm["pure_step_s"] = cached["pure_step_s"]
            tm["dispatch_rtt_s"] = cached["dispatch_rtt_s"]
            tm["timing_rerun_s"] = 0.0
        else:
            t_rerun = time.time()
            tiny = jax.jit(lambda x: x + 1.0)
            jax.block_until_ready(tiny(jnp.float32(0)))
            rtt = min(_timed(lambda i=i: jax.block_until_ready(
                tiny(jnp.float32(i)))) for i in range(1, 4))
            best = float("inf")
            for i in range(1, 4):
                jb = dict(jbatch)
                jb["coords"] = jbatch["coords"] + jnp.float32(7e-4 * i)
                jax.block_until_ready(jb["coords"])  # perturb outside timing
                best = min(best, _timed(lambda jb=jb: jax.block_until_ready(
                    step(params, state, jb))))
            tm["pure_step_s"] = max(best - rtt, 0.0)
            tm["dispatch_rtt_s"] = rtt
            # instrumentation, not pipeline work: callers subtract this from
            # their stage wall-clock
            tm["timing_rerun_s"] = time.time() - t_rerun
            _PURE_STEP_TIMINGS[skey] = {"pure_step_s": tm["pure_step_s"],
                                        "dispatch_rtt_s": rtt}

    cat = {k: np.concatenate(v, axis=0) for k, v in outs.items()}
    return (cat["semantic_prediction_logits"], cat["semantic_labels"],
            cat["offset_predictions"], cat["offset_labels"], cat["coords"],
            cat["instance_labels"], cat["backbone_feats"], cat["input_feats"],
            cat.get("point_ids"))
