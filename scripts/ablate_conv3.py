"""Round-3 conv select-tax ablation: aligned/restructured phase selects.

Round-2 production kernel (widesel): 2 one-hot row-gather GEMMs into
[g_lo|g_hi] (T, 256), then a 6-phase select building (T, 96) — measured 10 ms
of the 15.6 ms L0 conv (ablate_conv.py: prod 15.6, nosel 5.6).  The (T, 96)
planes are NOT 128-lane aligned -> Mosaic relayouts per op.

Variants (same DMA/grid structure):
  prod      — the round-2 production select (96-lane), for reference
  v1_pad128 — fused select padded to (T, 128): 4th lane group is a dummy that
              never matches; weight stack padded to (9, 128, Cout)
  v1_mul    — v1 with mask-multiply instead of jnp.where
  v7_pack2  — window viewed (W/2, 64): [g_lo|g_hi] is (T, 128) = 4 voxel
              groups, phases m+dd span [0, 3] -> exactly 4 phases on aligned
              planes, and the gather GEMMs shrink to N=64
  v8_pack1  — window viewed (W, 32): three one-hot GEMMs pick slots r0+s
              directly (s = 0,1,2); select = 3 phases re-ordering slots->dz

Usage: python scripts/ablate_conv3.py
"""

import functools
import os
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
from treelearn_tpu.ops.sparse import (build_dense_table, build_subm_rulebook,
                                      grid_from_sorted_keys)
from treelearn_tpu.ops.pallas_conv import rule_spans, _pack_feats, _band_weight

TILE = int(os.environ.get('ABL_TILE', 256))
WINDOW = int(os.environ.get('ABL_WINDOW', 1024))
_ALIGN = 64
C = 32


def make_kernel(variant, tile, cout):
    def kernel(lo_ref, n_live_ref, rd_ref, feats_hbm, w_ref, out_ref,
               window_buf, acc_ref, sems):
        t = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)

        if variant in ("prod", "v1_pad128", "v1_mul"):
            pack, lanes = 4, 128
        elif variant == "v7_pack2":
            pack, lanes = 2, 64
        else:  # v8_pack1
            pack, lanes = 1, 32
        window_rows = WINDOW // pack
        shift = {1: 0, 2: 1, 4: 2}[pack]

        @pl.when(t * tile < n_live_ref[0])
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def dma(b_idx, slot):
                start = pl.multiple_of(lo_ref[b_idx, t] // pack, _ALIGN // pack)
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(start, window_rows), :],
                    window_buf.at[slot], sems.at[slot])

            dma(0, 0).start()
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window_rows), 1)

            def body(b, _):
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < 9)
                def _():
                    dma(b + 1, jax.lax.rem(b + 1, 2)).start()

                dma(b, slot).wait()

                rd = rd_ref[b, :]
                has = rd >= 0
                r0 = jax.lax.shift_right_arithmetic(rd, 6)
                lo_row = lo_ref[b, t] // pack

                def dd_of(dz):
                    return jax.lax.bitwise_and(
                        jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1

                if variant in ("prod", "v1_pad128", "v1_mul", "v7_pack2"):
                    q0 = jnp.clip(
                        jax.lax.shift_right_arithmetic(r0, shift) - lo_row,
                        0, window_rows - 2)
                    q0m = jnp.where(has, q0, -1)
                    onehot = (q0m[:, None] == col_ids)
                    g_lo = jnp.dot(onehot.astype(jnp.bfloat16),
                                   window_buf[slot],
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                    onehot1 = (jnp.where(has, q0 + 1, -1)[:, None] == col_ids)
                    g_hi = jnp.dot(onehot1.astype(jnp.bfloat16),
                                   window_buf[slot],
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)
                    m = jax.lax.bitwise_and(r0, pack - 1)

                if variant == "prod":
                    phs = [jnp.where(has & (dd_of(dz) >= 0), m + dd_of(dz), -1)
                           for dz in range(3)]
                    lane3 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 3 * C), 1) // C
                    ph_plane = jnp.where(
                        lane3 == 0, phs[0][:, None],
                        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
                    sel_cat = jnp.zeros((tile, 3 * C), jnp.bfloat16)
                    for pv in range(pack + 2):
                        src = g_lo if pv < pack else g_hi
                        lane = (pv % pack) * C
                        blk = src[:, lane:lane + C]
                        wide = jnp.concatenate([blk, blk, blk], axis=1)
                        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
                elif variant in ("v1_pad128", "v1_mul"):
                    phs = [jnp.where(has & (dd_of(dz) >= 0), m + dd_of(dz), -1)
                           for dz in range(3)]
                    lane4 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 4 * C), 1) // C
                    ph_plane = jnp.where(
                        lane4 == 0, phs[0][:, None],
                        jnp.where(lane4 == 1, phs[1][:, None],
                                  jnp.where(lane4 == 2, phs[2][:, None], -7)))
                    sel_cat = jnp.zeros((tile, 4 * C), jnp.bfloat16)
                    for pv in range(pack + 2):
                        src = g_lo if pv < pack else g_hi
                        lane = (pv % pack) * C
                        blk = src[:, lane:lane + C]
                        wide = jnp.concatenate([blk, blk, blk, blk], axis=1)
                        if variant == "v1_mul":
                            sel_cat = sel_cat + (
                                (ph_plane == pv).astype(jnp.bfloat16) * wide)
                        else:
                            sel_cat = sel_cat + jnp.where(ph_plane == pv,
                                                          wide, 0)
                elif variant == "v7_pack2":
                    # [g_lo|g_hi] is (T, 128) = 4 voxel groups; phase m+dd in
                    # [0, 3] — 4 aligned phases
                    phs = [jnp.where(has & (dd_of(dz) >= 0), m + dd_of(dz), -1)
                           for dz in range(3)]
                    lane4 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 4 * C), 1) // C
                    ph_plane = jnp.where(
                        lane4 == 0, phs[0][:, None],
                        jnp.where(lane4 == 1, phs[1][:, None],
                                  jnp.where(lane4 == 2, phs[2][:, None], -7)))
                    src2 = jnp.concatenate([g_lo, g_hi], axis=1)  # (T, 128)
                    sel_cat = jnp.zeros((tile, 4 * C), jnp.bfloat16)
                    for pv in range(4):
                        blk = src2[:, pv * C:(pv + 1) * C]
                        wide = jnp.concatenate([blk, blk, blk, blk], axis=1)
                        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
                else:  # v8_pack1: three slot gathers, 3-phase dz reorder
                    rel = jnp.clip(r0 - lo_row, 0, window_rows - 3)
                    relm = jnp.where(has, rel, -1)
                    slots = []
                    for s in range(3):
                        oh = (jnp.where(has, rel + s, -1)[:, None] == col_ids)
                        slots.append(jnp.dot(
                            oh.astype(jnp.bfloat16), window_buf[slot],
                            preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16))
                    src2 = jnp.concatenate(
                        slots + [jnp.zeros((tile, C), jnp.bfloat16)], axis=1)
                    phs = [jnp.where(has & (dd_of(dz) >= 0), dd_of(dz), -1)
                           for dz in range(3)]
                    lane4 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 4 * C), 1) // C
                    ph_plane = jnp.where(
                        lane4 == 0, phs[0][:, None],
                        jnp.where(lane4 == 1, phs[1][:, None],
                                  jnp.where(lane4 == 2, phs[2][:, None], -7)))
                    sel_cat = jnp.zeros((tile, 4 * C), jnp.bfloat16)
                    for pv in range(3):
                        blk = src2[:, pv * C:(pv + 1) * C]
                        wide = jnp.concatenate([blk, blk, blk, blk], axis=1)
                        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)

                acc_ref[:] += jnp.dot(sel_cat, w_ref[b],
                                      preferred_element_type=jnp.float32)
                return _

            jax.lax.fori_loop(0, 9, body, None, unroll=False)
            out_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(lo, n_live, rd, feats_p, w_band, variant):
    capacity = rd.shape[1]
    cout = w_band.shape[2]
    if variant in ("prod", "v1_pad128", "v1_mul"):
        pack = 4
    elif variant == "v7_pack2":
        pack = 2
    else:
        pack = 1
    window_rows = WINDOW // pack
    ntiles = capacity // TILE
    wrows = w_band.shape[1]
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
            pltpu.VMEM((2, window_rows, pack * C), jnp.bfloat16),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(variant, TILE, cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capacity, cout), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lo, n_live, rd, feats_p, w_band)
    return out


def main():
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

    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w_band96 = jax.jit(lambda ww: _band_weight(ww, C))(w)       # (9, 96, C)
    w_band128 = jnp.pad(np.asarray(w_band96), ((0, 0), (0, C), (0, 0)))
    feats = [jnp.asarray(rng.normal(size=(capacity, C)).astype(np.float32),
                         jnp.bfloat16) for _ in range(3)]
    n_live = jnp.asarray([n], jnp.int32)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    packs = {"prod": (4, w_band96), "v1_pad128": (4, w_band128),
             "v1_mul": (4, w_band128), "v7_pack2": (2, w_band128),
             "v8_pack1": (1, w_band128)}
    ref_out = None
    for variant, (pack, wb) in packs.items():
        fsets = [jax.jit(lambda f_, p=pack: _pack_feats(f_, p, C))(f)
                 for f in feats]
        try:
            out = run_variant(spans.lo, n_live, spans.rd, fsets[0], wb, variant)
            out_np = np.asarray(out)[:n]
        except Exception as e:
            print(f"{variant:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        if ref_out is None:
            ref_out = out_np
            err = 0.0
        else:
            err = float(np.max(np.abs(out_np.astype(np.float32)
                                      - ref_out.astype(np.float32))))
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(
                run_variant(spans.lo, n_live, spans.rd, fsets[i % 3], wb,
                            variant))
            best = min(best, time.perf_counter() - t0)
        print(f"{variant:10s} {max(best - rtt, 0)*1e3:7.1f} ms   maxerr {err:.4f}")


if __name__ == "__main__":
    main()
