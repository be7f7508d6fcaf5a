"""Banded subm-conv kernel ablations (consolidated, VERDICT r4 item 9).

Two modes:
  --stages (default)  locate the bottleneck by stage: variants share the
      grid/DMA structure with consume() altered —
        full / nosel / noonehot / dmaonly / noloop
  --select            production select-form comparison: legacy 4-phase vs
      miss-form roll select (TL_CONV_SELECT binds at import, so each mode
      runs in a subprocess; prints a side-by-side table).

Superseded generations (findings in docs/performance.md, code in git history
@ 55d0239): ablate_conv2 (widesel/slotgemm redesigns — unaligned 96-lane
views force Mosaic relayouts, slower), ablate_conv3 (aligned/restructured
phase selects — lane alignment is not the cost), ablate_conv4 (staged select
+ pipelining — select is at the VPU vreg-op roofline), ablate_conv5
(dy-shared windows — window sharing holds but batched trio GEMMs lose to
per-band), plus the premise probes check_trio_spread / probe_lane_gather.
"""

import functools
import os
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from treelearn_tpu.data.synthetic import make_synthetic_forest
from treelearn_tpu.ops.pallas_conv import _band_weight, _pack_feats, rule_spans
from treelearn_tpu.ops.sparse import (build_dense_table, build_subm_rulebook,
                                      grid_from_sorted_keys)

TILE = int(os.environ.get('ABL_TILE', 256))
WINDOW = int(os.environ.get('ABL_WINDOW', 1024))
_ALIGN = 64


def make_kernel(variant, window_rows, tile, pack, c_unit, cout):
    shift = {1: 0, 2: 1, 4: 2}[pack]

    def kernel(lo_ref, n_live_ref, rd_ref, feats_hbm, w_ref, out_ref,
               window_buf, acc_ref, sems):
        t = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(t * tile < n_live_ref[0])
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def dma(b_idx, slot):
                start = pl.multiple_of(lo_ref[b_idx, t] // pack, _ALIGN // pack)
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(start, window_rows), :],
                    window_buf.at[slot], sems.at[slot])

            if variant != "noloop":
                dma(0, 0).start()
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window_rows), 1)

            def body(b, _):
                slot = jax.lax.rem(b, 2)
                if variant != "noloop":
                    @pl.when(b + 1 < 9)
                    def _():
                        dma(b + 1, jax.lax.rem(b + 1, 2)).start()
                    dma(b, slot).wait()

                rd = rd_ref[b, :]
                has = rd >= 0
                r0 = jax.lax.shift_right_arithmetic(rd, 6)
                lo_row = lo_ref[b, t] // pack
                if variant in ("full", "nosel"):
                    q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, shift) - lo_row,
                                  0, window_rows - 2)
                    q0m = jnp.where(has, q0, -1)
                    onehot = (q0m[:, None] == col_ids)
                    g_lo = jnp.dot(onehot.astype(jnp.bfloat16), window_buf[slot],
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                    onehot1 = (jnp.where(has, q0 + 1, -1)[:, None] == col_ids)
                    g_hi = jnp.dot(onehot1.astype(jnp.bfloat16), window_buf[slot],
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                    m = jax.lax.bitwise_and(r0, pack - 1)
                sels = []
                for dz in range(3):
                    if variant == "full":
                        dd = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
                        vmask = has & (dd >= 0)
                        ph = jnp.where(vmask, m + dd, -1)
                        sel = jnp.zeros((tile, c_unit), jnp.bfloat16)
                        for pv in range(2 * pack):
                            src = g_lo if pv < pack else g_hi
                            lane = (pv % pack) * c_unit
                            sel = sel + jnp.where(
                                ph[:, None] == pv,
                                src[:, lane:lane + c_unit], 0)
                    elif variant == "nosel":
                        lane = dz % pack * c_unit
                        sel = g_lo[:, lane:lane + c_unit]
                    elif variant == "noonehot":
                        dd = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
                        vmask = has & (dd >= 0)
                        ph = jnp.where(vmask, dd, -1)
                        g_lo2 = window_buf[slot][0:tile]
                        sel = jnp.zeros((tile, c_unit), jnp.bfloat16)
                        for pv in range(2 * pack):
                            lane = (pv % pack) * c_unit
                            sel = sel + jnp.where(
                                ph[:, None] == pv,
                                g_lo2[:, lane:lane + c_unit], 0)
                    else:
                        sel = jnp.zeros((tile, c_unit), jnp.bfloat16)
                    sels.append(sel)
                acc_ref[:] += jnp.dot(jnp.concatenate(sels, axis=1), w_ref[b],
                                      preferred_element_type=jnp.float32)
                return _

            jax.lax.fori_loop(0, 9, body, None, unroll=False)
            out_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(lo, n_live, rd, feats_p, w_band, variant):
    capacity = rd.shape[1]
    pack, c_unit = 4, 32
    cout = w_band.shape[2]
    window_rows = WINDOW // pack
    ntiles = capacity // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((9, TILE), lambda t, lo, nl: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda t, lo, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, pack * c_unit), jnp.bfloat16),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(variant, window_rows, TILE, pack, c_unit, cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capacity, cout), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lo, n_live, rd, feats_p, w_band)
    return jnp.sum(out).astype(jnp.float32)


def main_stages():
    capacity = 1 << 19
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0, points_per_tree=9000,
                                    ground_points=968000 - 48 * 9000, seed=3)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.min(0)
    keys = np.unique((np.floor(xyz / 0.1).astype(np.int64)
                      @ np.array([640 * 192, 192, 1], np.int64)))
    rng = np.random.default_rng(0)
    keys = np.sort(rng.choice(keys, 437740, replace=False))
    n = len(keys)
    keys_pad = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    keys_pad[:n] = keys
    k0 = jnp.asarray(keys_pad)
    g0 = grid_from_sorted_keys(k0, jnp.asarray(np.array([640, 640, 192], np.int32)),
                               jnp.int32(n))
    table = build_dense_table(g0, 640 * 640 * 192)
    rule = jax.jit(lambda g, t: build_subm_rulebook(g, 3, dense_table=t))(g0, table)
    spans = jax.jit(lambda r: rule_spans(r, TILE, WINDOW, capacity))(rule)
    print("spans ok:", bool(np.asarray(spans.ok)))

    w = jnp.asarray(rng.normal(size=(27, 32, 32)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w_band = jax.jit(lambda ww: _band_weight(ww, 32))(w)
    fsets = [jax.jit(lambda f_: _pack_feats(f_, 4, 32))(
        jnp.asarray(rng.normal(size=(capacity, 32)).astype(np.float32),
                    jnp.bfloat16)) for _ in range(3)]
    n_live = jnp.asarray([n], jnp.int32)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    from treelearn_tpu.ops.pallas_conv import subm_conv_banded
    fullsets = [jnp.asarray(rng.normal(size=(1 << 19, 32)).astype(np.float32),
                            jnp.bfloat16) for _ in range(3)]
    fn = jax.jit(lambda f_, sp: jnp.sum(subm_conv_banded(
        f_, w, rule, g0.live_mask, tile=TILE, window=WINDOW,
        spans=sp)).astype(jnp.float32))
    spans2 = jax.jit(lambda r: rule_spans(r, TILE, WINDOW, 1 << 19))(rule)
    float(fn(fullsets[0], spans2))
    best = 1e9
    for i in range(4):
        t0 = time.perf_counter()
        float(fn(fullsets[i % 3], spans2))
        best = min(best, time.perf_counter() - t0)
    print(f"prod      {max(best-rtt,0)*1e3:7.1f} ms")
    for variant in ("full", "nosel", "noonehot", "dmaonly", "noloop"):
        float(run_variant(spans.lo, n_live, spans.rd, fsets[0], w_band, variant))
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            float(run_variant(spans.lo, n_live, spans.rd, fsets[i % 3], w_band,
                              variant))
            best = min(best, time.perf_counter() - t0)
        print(f"{variant:9s} {max(best-rtt,0)*1e3:7.1f} ms")


def run_select_one():
    mode = os.environ.get("TL_CONV_SELECT", "roll")
    from treelearn_tpu.ops.pallas_conv import subm_conv_banded

    capacity = 1 << 17
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=9000,
                                    ground_points=968000 - 48 * 9000, seed=3)
    xyz = data[:, :3].astype(np.float32)
    xyz -= xyz.min(0)
    keys = np.unique((np.floor(xyz / 0.1).astype(np.int64)
                      @ np.array([640 * 192, 192, 1], np.int64)))
    rng = np.random.default_rng(0)
    n = min(len(keys), 114576)  # L0 count of the bench plot
    keys = np.sort(rng.choice(keys, n, replace=False))
    keys_pad = np.full(capacity, np.iinfo(np.int32).max, np.int32)
    keys_pad[:n] = keys
    k0 = jnp.asarray(keys_pad)
    g0 = grid_from_sorted_keys(
        k0, jnp.asarray(np.array([640, 640, 192], np.int32)), jnp.int32(n))
    table = build_dense_table(g0, 640 * 640 * 192)
    rule = jax.jit(lambda g, t: build_subm_rulebook(g, 3, dense_table=t))(
        g0, table)
    live = jnp.arange(capacity) < n
    spans = jax.jit(lambda r: rule_spans(r, 256, 768, capacity))(rule)
    ok = bool(np.asarray(spans.ok))

    # vary inputs per repetition and force one scalar D2H: identical
    # re-dispatches are deduped server-side and block_until_ready can no-op
    # through the tunnel (docs/performance.md profiling discipline)
    rtt_probe = jax.jit(lambda x: x + 1.0)
    float(rtt_probe(jnp.float32(0)))
    rtt = float("inf")
    for i in range(1, 4):
        t0 = time.time()
        float(rtt_probe(jnp.float32(i)))
        rtt = min(rtt, time.time() - t0)

    for cin, cout in ((32, 32), (64, 64)):
        feats = jax.device_put(
            rng.standard_normal((capacity, cin)).astype(np.float32))
        weight = jax.device_put(
            (rng.standard_normal((27, cin, cout)) * 0.1).astype(np.float32))

        CHAIN = 32  # amortize the 25-45 ms tunnel RTT over many kernels

        @jax.jit
        def conv_chain(f, eps):
            def body(_, x):
                y = subm_conv_banded(x, weight, rule, live, 256, 768,
                                     spans=spans)
                # renormalize so the chain neither explodes nor denorms
                return y * jax.lax.rsqrt(
                    jnp.mean(jnp.square(y)).astype(y.dtype) + 1e-12)
            out = jax.lax.fori_loop(0, CHAIN, body, f + eps)
            return jnp.sum(out[:8, :8].astype(jnp.float32))

        float(conv_chain(feats, jnp.float32(0)))  # compile
        best = float("inf")
        for i in range(1, 6):
            t0 = time.time()
            float(conv_chain(feats, jnp.float32(i * 1e-4)))
            best = min(best, time.time() - t0)
        dt = (best - rtt) / CHAIN
        print(f"[{mode}] cap {capacity} cin {cin} cout {cout} n_vox {n} "
              f"spans_ok {ok}: {dt*1e3:.2f} ms/conv (chain {CHAIN}, "
              f"rtt {rtt*1e3:.1f})", flush=True)


def main():
    if "--one" in sys.argv:
        run_select_one()
        return
    if "--select" in sys.argv:
        for mode in ("legacy", "roll"):
            env = dict(os.environ, TL_CONV_SELECT=mode)
            subprocess.run([sys.executable, osp.abspath(__file__), "--one"],
                           env=env, check=False)
        return
    main_stages()


if __name__ == "__main__":
    main()
