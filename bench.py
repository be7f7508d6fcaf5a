"""End-to-end segmentation benchmark.

Runs the full pipeline (voxelize -> tile -> sparse U-Net inference -> ensemble
-> cluster -> propagate -> save) on a procedurally generated forest on the
real device and reports throughput in Mpts/sec over raw input points.

Baseline derivation (see BASELINE.md): the reference publishes no Mpts/sec
figure.  Its only runtime anchor is the Colab demo — the ~1600 m^2
``plot_7_cut.laz`` (MLS, ~8.3M points at typical >5k pts/m^2 densities) in
~12-15 min on a T4, i.e. ~0.010 Mpts/sec end to end.  We use 0.010 Mpts/sec as
``vs_baseline`` denominator (labeled ``baseline_source``); the L1W/A100 number
must be measured once data and an A100 are available (bench_reference.py is
the harness; BASELINE_MEASURED.json records its current availability).

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} on
stdout.  The line is emitted UNCONDITIONALLY (VERDICT r4 item 1): a wall-clock
budget (BENCH_BUDGET_S, default 1500 s) sheds optional stages (prewarm,
best-of-N repeats, hard/hdbscan passes, decomposition) as it tightens, partial
results are flushed from SIGTERM/SIGALRM handlers, and self-training both
resumes from step checkpoints and stops at its time allotment.  Whatever was
not measured is listed in the ``degraded`` field.  Per-stage progress goes to
stderr so a killed run still shows where the time went.

Sizing: the default (~1.1M points, one 131072-voxel bucket, depth-7 U-Net)
finishes with a COLD compile cache in a few minutes on a v5e; the persistent
compile + executable caches (populated by any prior run with the same shapes)
remove the ~100 s eval-step compile on warm runs.  Scale up with BENCH_TREES /
BENCH_PPT / BENCH_GROUND / BENCH_EXTENT / BENCH_CAPACITY env vars.
"""

import json
import os
import shutil
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:
    import numpy as np
except ModuleNotFoundError:  # pragma: no cover
    # the image ships a bare /usr/local/bin/python ahead of the ML venv on
    # PATH; re-exec with the venv interpreter so `python bench.py` works
    # regardless of which python the caller resolved
    _venv = "/opt/venv/bin/python"
    # NOTE: can't compare realpath(sys.executable) — the venv python is a
    # symlink to the same base binary; only its pyvenv.cfg site dir differs
    if os.path.exists(_venv) and not os.environ.get("_TL_BENCH_REEXEC"):
        os.environ["_TL_BENCH_REEXEC"] = "1"
        try:
            os.execv(_venv, [_venv, os.path.abspath(__file__)] + sys.argv[1:])
        except OSError:
            pass  # fall through: report the original import error, not the
            # exec failure (ADVICE r2)
    raise

BASELINE_MPTS_PER_SEC = 0.010
BASELINE_SOURCE = ("colab-T4 estimate (plot_7_cut.laz ~12-15 min, "
                   "TreeLearn_Pipeline.ipynb); reference never measured here "
                   "- see BASELINE_MEASURED.json")
V5E_BF16_PEAK_FLOPS = 98.5e12  # per chip

def log(msg):
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500))

# Accumulated measurements + shed-stage record.  emit_result() prints the ONE
# JSON line from whatever these hold; it runs at normal completion, from the
# SIGTERM/SIGALRM handlers, and from a watchdog thread that fires even when
# the main thread is pinned inside a native call (XLA compile) past the
# budget.  First emit wins; the process exits 0 so the driver parses the line.
RESULT = {}
DEGRADED = []
_EMITTED = False


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def emit_result():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    easy_pts = RESULT.get("n_points") or 0
    easy_s = RESULT.get("seconds")
    if easy_s is None and RESULT.get("cold_seconds"):
        easy_s = RESULT["cold_seconds"]
        DEGRADED.append("steady_state_unmeasured_using_cold")
    hard_pts = RESULT.get("hard_n_points") or 0
    hard_s = RESULT.get("hard_seconds") or 0.0
    if easy_pts and easy_s:
        value = (easy_pts + hard_pts) / (easy_s + hard_s) / 1e6
        RESULT["easy_mpts_per_sec"] = round(easy_pts / easy_s / 1e6, 4)
    else:
        value = 0.0
        DEGRADED.append("no_scored_pass_completed")
    out = {
        "metric": "synthetic forest end-to-end segmentation "
                  "(steady state, easy+hard passes)",
        "value": round(value, 4),
        "unit": "Mpts/sec",
        "vs_baseline": round(value / BASELINE_MPTS_PER_SEC, 2),
        "baseline_source": BASELINE_SOURCE,
        **RESULT,
        "budget_s": BUDGET_S,
        "elapsed_s": round(time.time() - T0, 1),
        **({"degraded": DEGRADED} if DEGRADED else {}),
    }
    print(json.dumps(out))
    sys.stdout.flush()


def _emit_and_exit(signum, frame):
    log(f"signal {signum}: emitting partial result")
    DEGRADED.append(f"interrupted_signal_{signum}")
    emit_result()
    os._exit(0)


def install_watchdogs():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)
    # SIGALRM backstop shortly after budget: catches a main thread that is
    # looping in Python past its checks
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(int(BUDGET_S) + 60)
    # thread backstop: signal handlers only run at bytecode boundaries, so a
    # main thread stuck in one long native call (an XLA compile) past the
    # budget would otherwise die JSON-less at the driver's hard timeout
    import threading

    def _watch():
        time.sleep(max(BUDGET_S + 90 - (time.time() - T0), 1))
        if not _EMITTED:
            log("watchdog thread: budget+90s exceeded, emitting")
            DEGRADED.append("watchdog_thread_fired")
            emit_result()
            os._exit(0)

    threading.Thread(target=_watch, daemon=True).start()


def _probe_tunnel():
    """{"rtt_ms", "d2h_mb_per_s"} for the host<->device link RIGHT NOW
    (megaBYTES per second, not megabits).

    The tunneled v5e's link state varies minute to minute (identical cold
    passes measured 16.9 s and 366.8 s on the same commit + caches, 20 min
    apart); recording the link state alongside cold_seconds makes a
    pathological number attributable to the tunnel rather than the code.
    ~1 s of overhead: 4 scalar roundtrips + one 4 MB D2H fetch.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.float32(0)
    x = f(x)  # compile + ensure resident
    jax.block_until_ready(x)
    rtts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(f(x))
        rtts.append(time.perf_counter() - t0)
    big = jax.block_until_ready(jnp.zeros((1 << 20,), jnp.float32))  # 4 MB
    t0 = time.perf_counter()
    np.asarray(big)
    d2h_s = time.perf_counter() - t0
    return {"rtt_ms": round(min(rtts) * 1e3, 1),
            "d2h_mb_per_s": round(4.0 / max(d2h_s, 1e-9), 1)}


def _decompose_model_step(config, work, log):
    """Per-component timings of the whole-plot eval step (seconds): voxelize,
    plans (rulebook build), heads (devoxelize+MLPs), full, and the derived
    convs = full - plans_net - heads_net.  Uses the probe programs of
    TreeLearn.apply (model/network.py)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from treelearn_tpu.model import TreeLearn
    from treelearn_tpu.model.checkpoint import load_checkpoint
    from treelearn_tpu.ops.voxelize import level_voxel_counts_np

    vox_path = os.path.join(
        work, "plot",
        f"forest_voxelized{config.sample_generation.voxel_size}",
        "bench_forest_centered.npz")
    vox = np.load(vox_path)
    pts = vox["points"].astype(np.float64)
    vs = float(config.model.get("voxel_size", 0.1))
    ext = pts.max(axis=0) - pts.min(axis=0)
    ss = [int(np.ceil((np.ceil(e / vs) + 2) / 64)) * 64 for e in ext]
    nb = int(config.model.get("num_blocks", 7))

    from treelearn_tpu.model.blocks import level_tile_window
    from treelearn_tpu.ops.voxelize import level_span_windows_np
    from treelearn_tpu.pipeline.windows import (pow2, select_level_caps,
                                                select_level_windows)

    cap = pow2(len(pts))
    counts = level_voxel_counts_np(pts, vs, ss, nb)
    caps = select_level_caps(counts, cap)
    tiles = [level_tile_window(32 * (l + 1))[0] for l in range(nb)]
    req = level_span_windows_np(pts, vs, ss, nb, tiles, slack=0)
    wins = select_level_windows(req, caps)

    mc = dict(config.model)
    mc["spatial_shape"] = ss
    model = TreeLearn(**mc)
    params, state = model.init(0)
    if config.get("pretrain"):
        params, state, _ = load_checkpoint(config.pretrain, params, state)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)

    n = cap
    coords = np.zeros((n, 3), np.float32)
    coords[: len(pts)] = pts
    feats = np.ones((n, 1), np.float32)
    bids = np.zeros(n, np.int32)
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    jb = tuple(jax.device_put(a, dev) for a in (coords, feats, bids, valid))

    def make(probe):
        @jax.jit
        def f(params, state, coords, feats, bids, valid):
            out, _ = model.apply(params, state, coords, feats, bids, valid,
                                 batch_size=1, voxel_capacity=cap,
                                 training=False, compute_dtype=jnp.bfloat16,
                                 level_capacities=caps, level_windows=wins,
                                 probe=probe)
            if probe is None:
                return (jnp.sum(out["semantic_prediction_logits"])
                        + jnp.sum(out["offset_predictions"]))
            return out["probe_token"]
        return f

    times = {}
    for name, probe in (("voxelize", "voxelize"), ("plans", "plans"),
                        ("heads", "heads"), ("full", None)):
        f = make(probe)
        jax.block_until_ready(f(params, state, *jb))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = _time.time()
            jax.block_until_ready(f(params, state, *jb))
            best = min(best, _time.time() - t0)
        times[name] = round(best, 4)
    times["plans_net"] = round(times["plans"] - times["voxelize"], 4)
    times["heads_net"] = round(times["heads"] - times["voxelize"], 4)
    times["convs_net"] = round(
        times["full"] - times["plans"] - times["heads_net"], 4)
    log("model step decompose: " + " ".join(
        f"{k}={v:.3f}s" for k, v in times.items()))
    return times


def main():
    install_watchdogs()
    import jax

    # persistent compile cache: the env-var route does not engage reliably on
    # the axon backend — set it through jax.config explicitly.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from treelearn_tpu.config import ConfigDict, get_config
    from treelearn_tpu.data.synthetic import make_synthetic_forest
    from treelearn_tpu.pipeline import run_treelearn_pipeline

    # Warm the accelerator BEFORE the timed region: on tunneled devices the
    # first execution in a process pays a one-time attach/init cost that is
    # wildly variable (measured 1.5s-420s on the same chip) and has nothing to
    # do with pipeline throughput — the same category as CUDA context creation,
    # which the reference's Colab timing also excludes.  Runs on a background
    # thread so forest generation overlaps it.
    import threading

    def _warm():
        import jax.numpy as jnp
        jax.block_until_ready(jnp.zeros((8, 128)) + 1)

    warm_thread = threading.Thread(target=_warm, daemon=True)
    warm_thread.start()

    # Early-phase link guard: the tunnel client occasionally WEDGES on a lost
    # RPC response (main thread futex-waits forever, socket idle) while a
    # FRESH process attaches fine — observed twice on 2026-08-20, 20-30 min
    # each.  If the device warm + tunnel probe phase hasn't completed within
    # 240 s of the guard's start (armed AFTER selftrain, so a legitimate
    # cold training run can't trip it), re-exec the process once with a
    # fresh client, carrying the already-spent budget so the driver's outer
    # timeout still holds.  After this phase results accumulate, so later
    # wedges are left to the budget watchdogs (partial JSON).
    heartbeat = {"t": None, "phase": "warm+probe"}

    def beat(phase):
        heartbeat["t"] = time.time()
        heartbeat["phase"] = phase

    # per-phase leashes: the probe retries for free (240 s); the cold pass
    # can LEGITIMATELY run ~370 s on a slow-but-alive link (measured 366.8 s
    # warm-cache cold, docs/performance.md) so it gets 480 s — wedges last
    # 20-30 min, so the gap is safe; an opted-in subprocess prewarm
    # legitimately runs >1000 s and must never be treated as wedged
    _LEASH = {"warm+probe": 240, "cold_pass": 480, "prewarm": float("inf")}

    def _stall_guard():
        while True:
            time.sleep(15)
            if heartbeat["t"] is None:
                continue
            leash = _LEASH.get(heartbeat["phase"], 360)
            if time.time() - heartbeat["t"] < leash:
                continue
            retries = int(os.environ.get("_TL_BENCH_LINK_RETRY", "0"))
            # a fresh client redoes everything warm in ~450 s; re-exec (even
            # with partial results in memory — the first with-results policy
            # emitted a cold-only run at 613 s with 900 s of budget on the
            # table) while the budget can still buy a better run than the
            # one in hand, else emit what we have
            redo_cost = 600 if RESULT.get("seconds") else 300
            if retries < 2 and remaining() > redo_cost:
                log(f"device phase '{heartbeat['phase']}' wedged >{leash}s: "
                    f"re-exec with a fresh tunnel client "
                    f"(retry {retries + 1}/2)")
                os.environ["_TL_BENCH_LINK_RETRY"] = str(retries + 1)
                os.environ["BENCH_BUDGET_S"] = str(max(remaining() - 10, 120))
                sys.stdout.flush()
                sys.stderr.flush()
                os.execv(sys.executable,
                         [sys.executable, os.path.abspath(__file__)]
                         + sys.argv[1:])
            if RESULT.get("cold_seconds"):
                # retries exhausted (or budget too thin to redo) with
                # something scored: emit it rather than burning the rest of
                # the budget inside a dead client
                log(f"no progress for {leash}s in phase "
                    f"'{heartbeat['phase']}' with results in hand: emitting")
                DEGRADED.append(f"stalled_in_{heartbeat['phase']}")
                emit_result()
                os._exit(0)
            # retries spent and nothing scored: leave it to the budget alarm

    log(f"device: {jax.devices()[0]}")
    work = os.path.abspath("bench_workdir")
    shutil.rmtree(work, ignore_errors=True)
    forest_dir = os.path.join(work, "plot", "forest")
    os.makedirs(forest_dir, exist_ok=True)

    # sizing: the plot must be several tile widths across (35 m outer tiles)
    # so no single tile concentrates most of the voxelized plot — the central
    # tile's voxel count must stay under BENCH_CAPACITY
    n_trees = int(os.environ.get("BENCH_TREES", 48))
    points_per_tree = int(os.environ.get("BENCH_PPT", 16000))
    ground = int(os.environ.get("BENCH_GROUND", 200000))
    extent = float(os.environ.get("BENCH_EXTENT", 60.0))
    capacity = int(os.environ.get("BENCH_CAPACITY", 1 << 18))
    data, _ = make_synthetic_forest(
        n_trees=n_trees, extent=extent, points_per_tree=points_per_tree,
        ground_points=ground, seed=0)
    n_points = len(data)
    forest_path = os.path.join(forest_dir, "bench_forest.npz")
    np.savez(forest_path, points=data[:, :3].astype(np.float32),
             labels=data[:, 3])
    log(f"synthetic forest: {n_points} pts, {n_trees} trees, {extent}m extent")
    RESULT["n_points"] = n_points

    config = get_config(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "configs", "pipeline", "pipeline.yaml"))
    config.forest_path = forest_path
    config.pretrain = None
    config.tile_generation = True
    config.grouping.use_hdbscan = False  # on-device grouping path
    config.save_cfg = ConfigDict.from_dict({
        "save_formats": ["las"], "save_treewise": False,
        "save_pointwise": True, "return_type": "original",
        "save_backbone_feats": False,   # skip the 32-ch D2H + npz blob
        "results_dir": "results",
    })

    # Trained weights (cached across runs): the post-model stages then see a
    # realistic prediction distribution, and the run is scored with detection
    # F1 against the synthetic ground truth (the reference's protocol,
    # tools/evaluation/evaluate.py:92-99).  BENCH_TRAIN=0 restores the
    # random-weights timing-only mode.
    # Recipe (BENCH_RECIPE, selftrain.py; from the scripts/exp_hard_quality.py
    # sweep): 192 density-randomized crops at 6000 steps reaches hard-forest
    # detection F1 81.8 / commission 10% / matched-IoU 80.2 held-out (vs
    # 40.0 / 64.5 / 66.7 for the round-3 600-step x 12-crop recipe).  A cold
    # run trains ~45 min on a v5e but is RESUMABLE (partial checkpoints every
    # 500 steps) and stops at its time allotment, returning the partial; the
    # finished checkpoint is cached by recipe fingerprint, so subsequent
    # benches skip straight to inference.
    train_info = None
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        from treelearn_tpu.train.selftrain import (BENCH_RECIPE,
                                                   train_synthetic_checkpoint)

        recipe = dict(BENCH_RECIPE)
        recipe["steps"] = int(os.environ.get("BENCH_TRAIN_STEPS",
                                             recipe["steps"]))
        recipe["n_crops"] = int(os.environ.get("BENCH_TRAIN_CROPS",
                                               recipe["n_crops"]))
        # leave room for the scored cold pass + smoke + quality scoring even
        # when training eats everything else
        train_budget = max(remaining() - 480, 120)
        config.pretrain, train_info = train_synthetic_checkpoint(
            dict(config.model), logger=log, max_seconds=train_budget,
            return_info=True, **recipe)
        RESULT["trained_steps"] = train_info["completed_steps"]
        if not train_info["complete"]:
            DEGRADED.append(
                f"selftrain_partial_{train_info['completed_steps']}of"
                f"{train_info['target_steps']}")
    else:
        RESULT["trained_steps"] = 0
    config.shape_cfg.outer_remove = None
    config.voxel_capacity = capacity
    config.dataloader.batch_size = 1

    beat("warm+probe")
    threading.Thread(target=_stall_guard, daemon=True).start()
    warm_thread.join()
    log(f"device warm (budget: {remaining():.0f}s left)")
    try:
        RESULT["tunnel_before_cold"] = _probe_tunnel()
        log(f"tunnel: {RESULT['tunnel_before_cold']}")
    except Exception as e:  # the probe is reporting, not gating
        log(f"tunnel probe failed: {type(e).__name__}: {e}")
    beat("cold_pass")
    retries_used = os.environ.get("_TL_BENCH_LINK_RETRY")
    if retries_used:
        DEGRADED.append(f"link_retry_reexec_{retries_used}")

    # Install-time prewarm (VERDICT r2 item 7): a SUBPROCESS runs the same
    # pipeline once via tools/prewarm.py, populating the persistent compile +
    # executable caches.  The timed cold pass below then measures what a
    # production "segment one plot" process pays on a prewarmed installation:
    # executable-cache deserialization + one plot — with a cleared in-process
    # cache (it is a fresh process).  OFF by default (BENCH_PREWARM=1 opts
    # in): on the tunneled single-chip backend a child process contends with
    # the parent's device handle and was measured taking >1000 s for a
    # pipeline that runs ~320 s in-process — it starved every scored pass of
    # the 08:39 r5 run.  The cold pass below doubles as the prewarm; on an
    # installation whose persistent caches are already warm it measures
    # exec-cache deserialization + one plot, which is the production number.
    if os.environ.get("BENCH_PREWARM", "0") != "0" and remaining() > 1000:
        beat("prewarm")  # unbounded leash: a legit prewarm runs >1000 s
        import subprocess

        import yaml

        from treelearn_tpu.config import config_to_dict

        pw_cfg = os.path.join(work, "prewarm_cfg.yaml")
        with open(pw_cfg, "w") as f:
            yaml.safe_dump(config_to_dict(config), f)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "tools", "prewarm.py"),
                 "--config", pw_cfg,
                 "--work-dir", os.path.join(work, "prewarm")],
                capture_output=True, text=True,
                timeout=max(remaining() - 420, 60))
            rc = proc.returncode
            err = proc.stderr
        except subprocess.TimeoutExpired as e:
            rc, err = -1, f"prewarm timeout after {e.timeout:.0f}s"
            DEGRADED.append("prewarm_timeout")
        RESULT["prewarm_seconds"] = round(time.time() - t0, 1)
        if rc != 0:
            log(f"prewarm FAILED (rc {rc}): {str(err)[-2000:]}")
        else:
            log(f"install prewarm: {RESULT['prewarm_seconds']}s (subprocess; "
                "compile + executable caches now warm)")
        beat("cold_pass")
    elif os.environ.get("BENCH_PREWARM", "0") != "0":
        DEGRADED.append("prewarm_skipped")
        log(f"prewarm shed (budget: {remaining():.0f}s left)")

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    # The scored pass runs FIRST (VERDICT r4 item 1c): it pays the one-time
    # per-process costs (cold_seconds — what a fresh "segment one plot"
    # process costs on a prewarmed installation) and its outputs are scored
    # with the reference's detection protocol immediately, so even a run
    # killed right after this point carries quality + throughput evidence.
    t0 = time.time()
    result = run_treelearn_pipeline(config)
    cold_elapsed = time.time() - t0
    RESULT["cold_seconds"] = round(cold_elapsed, 1)
    RESULT["cold_mpts_per_sec"] = round(n_points / cold_elapsed / 1e6, 4)
    RESULT["cold_stage_seconds"] = dict(result.get("stage_seconds", {}))
    RESULT["cold_model_compile_seconds"] = result.get(
        "model_timings", {}).get("compile_s")
    RESULT["n_trees_found"] = result["n_trees"]
    log(f"cold pass: {cold_elapsed:.1f}s — stages "
        f"{RESULT['cold_stage_seconds']}")
    try:
        RESULT["tunnel_after_cold"] = _probe_tunnel()
        log(f"tunnel: {RESULT['tunnel_after_cold']}")
    except Exception as e:
        log(f"tunnel probe failed: {type(e).__name__}: {e}")
    beat("score")

    pw = os.path.join(result["results_dir"], "pointwise_results",
                      "pointwise_results.npz")
    if os.path.isfile(pw):
        from treelearn_tpu.train.selftrain import detection_f1_from_pointwise

        q = detection_f1_from_pointwise(pw)
        log(f"detection: F1 {q['f1_score']}% completeness {q['completeness']}%"
            f" commission {q['commission_error_rate']}%"
            f" matched-IoU {q.get('mean_matched_iou')}%"
            f" ({q['n_pred']} preds / {q['n_gt']} gt)")
        RESULT.update({
            "detection_f1": q["f1_score"],
            "completeness": q["completeness"],
            "commission_error_rate": q["commission_error_rate"],
            "mean_matched_iou": q.get("mean_matched_iou"),
        })

    # several steady passes, keep the fastest: the tunneled device's host
    # link load varies minute to minute (identical passes measured 12.7 s
    # and 25.6 s), and the steady state of a resident service is the
    # un-contended one
    n_steady = int(os.environ.get("BENCH_STEADY_PASSES", 3))
    steady_est = max(cold_elapsed * 0.3, 15.0)
    elapsed = None
    for p in range(n_steady):
        if remaining() < steady_est + 60:
            DEGRADED.append(f"steady_passes_{p}of{n_steady}")
            break
        beat("steady")
        shutil.rmtree(result["results_dir"], ignore_errors=True)
        # the pipeline re-points forest_path at the centered copy it wrote;
        # restore the original so each steady pass repeats the full work
        config.forest_path = forest_path
        t0 = time.time()
        r = run_treelearn_pipeline(config)
        dt = time.time() - t0
        steady_est = min(steady_est, dt)
        log(f"steady pass {p + 1}/{n_steady}: {dt:.1f}s "
            f"(budget: {remaining():.0f}s left)")
        if elapsed is None or dt < elapsed:
            elapsed, result = dt, r
    if profile_dir:
        jax.profiler.stop_trace()
        log(f"profiler trace written to {profile_dir}")

    if elapsed is not None:
        RESULT["seconds"] = round(elapsed, 1)
        RESULT["stage_seconds"] = result.get("stage_seconds", {})
        for name, secs in RESULT["stage_seconds"].items():
            log(f"stage {name:<18} {secs:7.2f}s")

    tm = result.get("model_timings", {})
    if tm.get("steps"):
        from treelearn_tpu.model.network import analytic_model_flops

        # pure_step_s: one re-dispatched step with no host transfer — the
        # honest compute number on a tunnel whose D2H stalls dominate
        # device_s.  Falls back to device_s when unavailable.
        per_step = tm.get("pure_step_s") or max(tm["device_s"], 1e-9) / tm["steps"]
        compute_s = per_step * tm["steps"]
        model_mpts = tm["points"] / compute_s / 1e6
        mfu = None
        if tm.get("n_vox_levels") is not None:
            # XLA cost analysis cannot see scan/Pallas FLOPs; use the
            # analytic per-level conv footprint instead
            flops_per_step = analytic_model_flops(
                tm["n_vox_levels"], tm["points"] // tm["steps"],
                channels=config.model.get("channels", 32),
                num_blocks=config.model.get("num_blocks", 7),
                rule_nnz_per_level=tm.get("rule_nnz"))
            mfu = (flops_per_step * tm["steps"] / compute_s
                   / V5E_BF16_PEAK_FLOPS)
        log(f"model: {tm['steps']} steps, compile {tm['compile_s']:.1f}s, "
            f"device {compute_s:.2f}s -> {model_mpts:.1f} Mpts/s model-only"
            + (f", MFU ~{100 * mfu:.1f}%" if mfu is not None else ""))
        RESULT.update({
            "model_only_mpts_per_sec": round(model_mpts, 2),
            "model_compile_seconds": round(tm["compile_s"], 1),
            **({"model_flops_per_step": flops_per_step,
                "model_mfu": round(mfu, 4)} if mfu is not None else {}),
        })

    # Hard-mode pass (VERDICT r2 item 4): interlocking crowns, understory
    # clutter, occlusion shadows, density gradients — scored with the same
    # trained checkpoint and the full reference protocol (detection F1 +
    # matched IoU + 10-bin xy/z partition means).  A sub-99% score here is
    # expected; it is the regression anchor for clustering quality on
    # L1W-like geometry.  BENCH_HARD=0 skips.
    if os.environ.get("BENCH_HARD", "1") != "0" and remaining() > 120:
        from treelearn_tpu.data.synthetic import make_synthetic_forest_hard
        from treelearn_tpu.train.selftrain import (
            detection_f1_from_pointwise, segmentation_partition_summary)

        hdata, _ = make_synthetic_forest_hard(
            n_trees=n_trees, extent=extent,
            points_per_tree=points_per_tree, ground_points=ground, seed=0)
        hard_path = os.path.join(forest_dir, "bench_forest_hard.npz")
        np.savez(hard_path, points=hdata[:, :3].astype(np.float32),
                 labels=hdata[:, 3])
        log(f"hard forest: {len(hdata)} pts, {int(hdata[:, 3].max())} trees")
        # best of 2 when the budget allows: the first hard pass pays its own
        # shape-bucket compiles (the hard plot voxelizes to a different
        # capacity bucket than the easy one); the steady number is the warm
        # second pass
        hard_elapsed = float("inf")
        hres = None
        for hp_i in range(2):
            beat("hard")
            config.forest_path = hard_path
            t0 = time.time()
            hres = run_treelearn_pipeline(config)
            hard_elapsed = min(hard_elapsed, time.time() - t0)
            if hp_i == 0:
                hpw = os.path.join(hres["results_dir"], "pointwise_results",
                                   "pointwise_results.npz")
                hq = detection_f1_from_pointwise(hpw)
                hp = segmentation_partition_summary(hpw)
                RESULT.update({
                    "hard_n_points": len(hdata),
                    "hard_seconds": round(hard_elapsed, 1),
                    "hard_detection_f1": hq["f1_score"],
                    "hard_completeness": hq["completeness"],
                    "hard_commission_error_rate": hq["commission_error_rate"],
                    "hard_mean_matched_iou": hq.get("mean_matched_iou"),
                    "hard_xy_partition_mean_iou": hp["xy_partition_mean_iou"],
                    "hard_z_partition_mean_iou": hp["z_partition_mean_iou"],
                })
                log(f"hard detection: F1 {hq['f1_score']}% completeness "
                    f"{hq['completeness']}% commission "
                    f"{hq['commission_error_rate']}% matched-IoU "
                    f"{hq.get('mean_matched_iou')}% ({hq['n_pred']} preds / "
                    f"{hq['n_gt']} gt) in {hard_elapsed:.1f}s")
                log(f"hard partitions: xy mean IoU "
                    f"{hp['xy_partition_mean_iou']}% z mean IoU "
                    f"{hp['z_partition_mean_iou']}%")
                if remaining() < hard_elapsed + 60:
                    DEGRADED.append("hard_single_pass")
                    break
        RESULT["hard_seconds"] = round(hard_elapsed, 1)
    elif os.environ.get("BENCH_HARD", "1") != "0":
        DEGRADED.append("hard_pass_skipped")

    # HDBSCAN-mode pass (VERDICT r3 item 5): the shipped default config is
    # use_hdbscan: True (grouping.yaml:7, matching reference grouping.yaml:7 /
    # BASELINE config 4) — score the flagship default alongside dbscan mode.
    # BENCH_HDBSCAN=0 skips.
    if os.environ.get("BENCH_HDBSCAN", "1") != "0" and remaining() > 90:
        from treelearn_tpu.train.selftrain import detection_f1_from_pointwise

        beat("hdbscan")
        config.forest_path = forest_path
        config.grouping.use_hdbscan = True
        shutil.rmtree(result["results_dir"], ignore_errors=True)
        t0 = time.time()
        hres = run_treelearn_pipeline(config)
        hd_elapsed = time.time() - t0
        hpw = os.path.join(hres["results_dir"], "pointwise_results",
                           "pointwise_results.npz")
        hq = detection_f1_from_pointwise(hpw)
        log(f"hdbscan mode: F1 {hq['f1_score']}% completeness "
            f"{hq['completeness']}% commission {hq['commission_error_rate']}%"
            f" matched-IoU {hq.get('mean_matched_iou')}% in {hd_elapsed:.1f}s"
            f" ({hq['n_pred']} preds / {hq['n_gt']} gt)")
        RESULT.update({
            "hdbscan_seconds": round(hd_elapsed, 1),
            "hdbscan_mpts_per_sec": round(n_points / hd_elapsed / 1e6, 4),
            "hdbscan_detection_f1": hq["f1_score"],
            "hdbscan_completeness": hq["completeness"],
            "hdbscan_commission_error_rate": hq["commission_error_rate"],
            "hdbscan_mean_matched_iou": hq.get("mean_matched_iou"),
            "hdbscan_cluster_seconds": hres["stage_seconds"].get("cluster"),
        })
        config.grouping.use_hdbscan = False
    elif os.environ.get("BENCH_HDBSCAN", "1") != "0":
        DEGRADED.append("hdbscan_pass_skipped")

    # compiled-kernel smoke (VERDICT r4 item 7): every Pallas kernel family
    # vs its exact oracle ON DEVICE (the CPU tests run interpret mode; this
    # records evidence for the Mosaic lowerings).  Runs AFTER every scored
    # pass: at ~2 min (the 220k-candidate device-HDBSCAN check dominates) it
    # is the longest wedge window in the bench, and a stall here must not
    # cost the headline numbers.  TL_TPU_SMOKE=0 skips.
    if os.environ.get("TL_TPU_SMOKE", "1") != "0" and remaining() > 30:
        from treelearn_tpu.utils.smoke import run_tpu_smoke

        beat("smoke")
        t0 = time.time()
        smoke = run_tpu_smoke()
        log(f"tpu kernel smoke: {smoke['passed']} passed "
            f"{smoke['failed']} failed {smoke['checks']} "
            f"({time.time()-t0:.1f}s)")
        RESULT["tpu_smoke"] = smoke
    elif os.environ.get("TL_TPU_SMOKE", "1") != "0":
        DEGRADED.append("tpu_smoke_skipped")

    if (os.environ.get("BENCH_DECOMPOSE", "1") != "0" and tm.get("steps")
            and remaining() > 120):
        # attribute the model step (VERDICT r2 item 1): time the
        # voxelize-only, voxelize+plans, and voxelize+heads probe
        # programs on the SAME whole-plot batch, so conv time falls out
        # as full - plans_net - heads_net
        try:
            beat("decompose")
            RESULT["model_step_decompose_s"] = _decompose_model_step(
                config, work, log)
        except Exception as e:  # decomposition is reporting, not gating
            log(f"decompose skipped: {type(e).__name__}: {e}")
    elif os.environ.get("BENCH_DECOMPOSE", "1") != "0":
        DEGRADED.append("decompose_skipped")

    RESULT["device"] = str(jax.devices()[0])
    emit_result()


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # the JSON line must exist even on a crash
        # (e.g. a TPU worker restart mid-pipeline, the round-5 10M probe)
        import traceback

        log(f"FATAL {type(e).__name__}: {e}")
        traceback.print_exc()
        DEGRADED.append(f"exception_{type(e).__name__}")
        RESULT.setdefault("error", f"{type(e).__name__}: {e}"[:500])
        emit_result()
        raise SystemExit(0)
