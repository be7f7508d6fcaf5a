"""Round-3 conv select-tax ablation, part 2: staged select + pipelining.

ablate_conv3 showed lane-ALIGNMENT is not the select's cost (pad128/mul were
neutral): the 6-phase select is at the VPU vreg-op roofline (~700 vreg-ops
per (tile, band) ~= the measured 11.7 ms at 1700 tiles x 9 bands x 0.94 GHz).
So the wins must come from (a) fewer vreg-ops and (b) hiding VPU work under
the MXU gather GEMMs.

Variants:
  prod       — round-2 production select (6 phases over (T, 96))
  v9_stage   — stage 1: binary select on the phase m (SHARED across dz)
               produces run[:, j*c:(j+1)*c] = x[r0+j]; stage 2: 3-phase
               dz<-dd select.  ~2x fewer vreg-ops.
  v10_pipe   — v9 + software pipelining: band b's gather GEMMs (MXU) issue
               before band b-1's select (VPU) so the VLIW scheduler can
               co-issue them; gcat staged in a 2-slot VMEM scratch.
  v11_pipe6  — prod's 6-phase select with the same pipelining (isolates the
               pipelining gain from the select restructure).

Usage: python scripts/ablate_conv4.py
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
PACK = 4


def _gather_pair(rd, lo_row, window, col_ids, tile, window_rows, shift):
    """The two one-hot row-gather GEMMs -> gcat (T, 2*pack*c)."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, shift) - lo_row,
                  0, window_rows - 2)
    q0m = jnp.where(has, q0, -1)
    onehot = (q0m[:, None] == col_ids)
    g_lo = jnp.dot(onehot.astype(jnp.bfloat16), window,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    onehot1 = (jnp.where(has, q0 + 1, -1)[:, None] == col_ids)
    g_hi = jnp.dot(onehot1.astype(jnp.bfloat16), window,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return jnp.concatenate([g_lo, g_hi], axis=1)


def _select_prod(rd, gcat, tile, pack, c):
    """Round-2 production: 6-phase select over (T, 3c)."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    m = jax.lax.bitwise_and(r0, pack - 1)
    phs = []
    for dz in range(3):
        dd = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
        phs.append(jnp.where(has & (dd >= 0), m + dd, -1))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (tile, 3 * c), 1) // c
    ph_plane = jnp.where(
        lane3 == 0, phs[0][:, None],
        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
    sel_cat = jnp.zeros((tile, 3 * c), jnp.bfloat16)
    for pv in range(pack + 2):
        half = gcat[:, :pack * c] if pv < pack else gcat[:, pack * c:]
        lane = (pv % pack) * c
        blk = half[:, lane:lane + c]
        wide = jnp.concatenate([blk, blk, blk], axis=1)
        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
    return sel_cat


def _select_staged(rd, gcat, tile, pack, c):
    """Stage 1: binary m-select (shared across dz) -> run; stage 2: 3-phase
    dd select regrouping slots -> dz."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    m = jax.lax.bitwise_and(r0, pack - 1)
    if pack == 4:
        # run[:, j*c:(j+1)*c] = x[r0+j]  (j = 0..3; j=3 unused)
        m6 = jnp.broadcast_to(m[:, None], (tile, 6 * c))
        u = jnp.where(m6 >= 2, gcat[:, 2 * c:8 * c], gcat[:, 0:6 * c])
        m4 = jax.lax.bitwise_and(m6[:, 0:4 * c], 1)
        run = jnp.where(m4 == 1, u[:, c:5 * c], u[:, 0:4 * c])
    else:  # pack == 2
        m3 = jnp.broadcast_to(m[:, None], (tile, 3 * c))
        run = jnp.where(m3 == 1, gcat[:, c:4 * c], gcat[:, 0:3 * c])
    dds = []
    for dz in range(3):
        dd = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
        dds.append(jnp.where(has & (dd >= 0), dd, -1))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (tile, 3 * c), 1) // c
    dd_plane = jnp.where(
        lane3 == 0, dds[0][:, None],
        jnp.where(lane3 == 1, dds[1][:, None], dds[2][:, None]))
    sel_cat = jnp.zeros((tile, 3 * c), jnp.bfloat16)
    for j in range(3):
        blk = run[:, j * c:(j + 1) * c]
        wide = jnp.concatenate([blk, blk, blk], axis=1)
        sel_cat = sel_cat + jnp.where(dd_plane == j, wide, 0)
    return sel_cat


CHUNK = 64  # packed rows per dynamic-extent GEMM chunk


def _gather_pair_chunked(rd, lo_row, nq, window_buf, slot, col64, tile,
                         window_rows, shift, lanes):
    """Gather (g_lo, g_hi) via per-chunk one-hot GEMMs over only the nq
    occupied CHUNK-row chunks of the window (the live span of a (tile, band)
    is usually ~tile-sized while the static window is 4x the tile — the
    full-window GEMM wastes ~36x the useful MACs)."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, shift) - lo_row,
                  0, window_rows - 2)
    q0m = jnp.where(has, q0, -1)
    q1m = jnp.where(has, q0 + 1, -1)

    def chunk(cidx, carry):
        glo, ghi = carry
        base = cidx * CHUNK
        win_c = window_buf[slot, pl.ds(base, CHUNK), :]
        rel = q0m - base
        oh = (rel[:, None] == col64).astype(jnp.bfloat16)
        glo = glo + jnp.dot(oh, win_c, preferred_element_type=jnp.float32)
        rel1 = q1m - base
        oh1 = (rel1[:, None] == col64).astype(jnp.bfloat16)
        ghi = ghi + jnp.dot(oh1, win_c, preferred_element_type=jnp.float32)
        return glo, ghi

    z = jnp.zeros((tile, lanes), jnp.float32)
    g_lo, g_hi = jax.lax.fori_loop(0, nq, chunk, (z, z))
    return jnp.concatenate([g_lo.astype(jnp.bfloat16),
                            g_hi.astype(jnp.bfloat16)], axis=1)


def _gather_slide(rd, lo_row, window, col_ids, tile, window_rows):
    """Sliding-pair (stride-2, span-4) layout: window row q = voxels
    [2q : 2q+4] as 4*c lanes.  ONE one-hot GEMM fetches the whole candidate
    run (phase m = r0 & 1 spans just 2 values -> 4 select phases, vs 6 for
    the pack-4 layout), no g_hi row pair."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, 1) - lo_row,
                  0, window_rows - 1)
    q0m = jnp.where(has, q0, -1)
    onehot = (q0m[:, None] == col_ids)
    return jnp.dot(onehot.astype(jnp.bfloat16), window,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _select_slide(rd, g, tile, c):
    """4-phase select for the sliding-pair layout: g (T, 4c) holds voxels
    [2*(r0>>1) .. +3]; lane group of slot r0+dd is (r0 & 1) + dd."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    m = jax.lax.bitwise_and(r0, 1)
    phs = []
    for dz in range(3):
        dd = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
        phs.append(jnp.where(has & (dd >= 0), m + dd, -1))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (tile, 3 * c), 1) // c
    ph_plane = jnp.where(
        lane3 == 0, phs[0][:, None],
        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
    sel_cat = jnp.zeros((tile, 3 * c), jnp.bfloat16)
    for pv in range(4):
        blk = g[:, pv * c:(pv + 1) * c]
        wide = jnp.concatenate([blk, blk, blk], axis=1)
        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
    return sel_cat


def make_kernel(variant, tile, cout):
    pack, c = PACK, C
    window_rows = WINDOW // pack
    shift = {1: 0, 2: 1, 4: 2}[pack]
    pipelined = variant in ("v10_pipe", "v11_pipe6")
    select = _select_staged if variant == "v9_stage" else _select_prod
    chunked = variant == "v12_chunk"
    slide = variant == "v13_slide"
    if slide:
        window_rows = WINDOW // 2      # stride-2 rows, 4c lanes each

    def kernel(lo_ref, n_live_ref, nq_ref, rd_ref, feats_hbm, w_ref, out_ref,
               window_buf, acc_ref, gbuf, sems):
        t = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(t * tile < n_live_ref[0])
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

            div = 2 if slide else pack

            def dma(b_idx, slot):
                start = pl.multiple_of(lo_ref[b_idx, t] // div, _ALIGN // div)
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(start, window_rows), :],
                    window_buf.at[slot], sems.at[slot])

            dma(0, 0).start()
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (tile, window_rows), 1)
            col64 = jax.lax.broadcasted_iota(jnp.int32, (tile, CHUNK), 1)

            def consume(b, sel_cat):
                acc_ref[:] += jnp.dot(sel_cat, w_ref[b],
                                      preferred_element_type=jnp.float32)

            if not pipelined:
                def body(b, _):
                    slot = jax.lax.rem(b, 2)

                    @pl.when(b + 1 < 9)
                    def _():
                        dma(b + 1, jax.lax.rem(b + 1, 2)).start()

                    dma(b, slot).wait()
                    rd = rd_ref[b, :]
                    if slide:
                        g = _gather_slide(rd, lo_ref[b, t] // 2,
                                          window_buf[slot], col_ids, tile,
                                          window_rows)
                        consume(b, _select_slide(rd, g, tile, c))
                        return _
                    if chunked:
                        gcat = _gather_pair_chunked(
                            rd, lo_ref[b, t] // pack, nq_ref[b, t],
                            window_buf, slot, col64, tile, window_rows,
                            shift, pack * c)
                    else:
                        gcat = _gather_pair(rd, lo_ref[b, t] // pack,
                                            window_buf[slot], col_ids, tile,
                                            window_rows, shift)
                    consume(b, select(rd, gcat, tile, pack, c))
                    return _

                jax.lax.fori_loop(0, 9, body, None, unroll=False)
            else:
                def body(b, _):
                    @pl.when(b < 9)
                    def _():
                        slot = jax.lax.rem(b, 2)

                        @pl.when(b + 1 < 9)
                        def _():
                            dma(b + 1, jax.lax.rem(b + 1, 2)).start()

                        dma(b, slot).wait()
                        rd = rd_ref[b, :]
                        gbuf[slot] = _gather_pair(
                            rd, lo_ref[b, t] // pack, window_buf[slot],
                            col_ids, tile, window_rows, shift)

                    @pl.when(b > 0)
                    def _():
                        bp = b - 1
                        rd = rd_ref[bp, :]
                        sel = select(rd, gbuf[jax.lax.rem(bp, 2)], tile,
                                     pack, c)
                        consume(bp, sel)
                    return _

                jax.lax.fori_loop(0, 10, body, None, unroll=False)

            out_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "chain"))
def run_chained(lo, n_live, rd, nq, feats_p, w_band, variant, chain=10):
    """Run the conv ``chain`` times inside ONE program, each iteration's
    input perturbed by the previous output, so per-iteration device time is
    measurable without per-dispatch tunnel noise (RTT ~25-40 ms >> kernel)."""
    def body(i, fp):
        out = run_variant(lo, n_live, rd, nq, fp, w_band, variant)
        upd = out.reshape(fp.shape[0], -1)
        while upd.shape[1] < fp.shape[1]:
            upd = jnp.concatenate([upd, upd], axis=1)
        return fp + upd * jnp.bfloat16(1e-3)

    return jax.lax.fori_loop(0, chain, body, feats_p)


def run_variant(lo, n_live, rd, nq, feats_p, w_band, variant):
    capacity = rd.shape[1]
    cout = w_band.shape[2]
    window_rows = WINDOW // 2 if variant == "v13_slide" else WINDOW // PACK
    lanes = 4 * C if variant == "v13_slide" else PACK * C
    ntiles = capacity // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((9, TILE), lambda t, lo, nl, nq: (0, t)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, cout), lambda t, lo, nl, nq: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, lanes), jnp.bfloat16),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.VMEM((2, TILE, 2 * PACK * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(variant, TILE, cout),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((capacity, cout), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(lo, n_live, nq, rd, feats_p, w_band)
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
    w_band = jax.jit(lambda ww: _band_weight(ww, C))(w)       # (9, 96, C)
    feats = [jnp.asarray(rng.normal(size=(capacity, C)).astype(np.float32),
                         jnp.bfloat16) for _ in range(3)]
    fsets = [jax.jit(lambda f_: _pack_feats(f_, PACK, C))(f) for f in feats]
    n_live = jnp.asarray([n], jnp.int32)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    # per-(band, tile) occupied-chunk counts for the dynamic-extent variant:
    # hi = one past the max slot any rulebook entry of the (band, tile) needs
    ntiles = capacity // TILE
    rb = np.asarray(rule).reshape(9, 3, capacity)
    rmax = np.max(np.where(rb >= 0, rb, -1), axis=1)          # (9, V)
    rt = rmax.reshape(9, ntiles, TILE)
    hi = np.max(rt, axis=2) + 1                               # (9, ntiles) vox
    lo_np = np.asarray(spans.lo)
    rows_needed = np.maximum((hi - 1 - lo_np) // PACK + 2, 0)
    nq = np.where(hi > 0, (rows_needed + CHUNK - 1) // CHUNK,
                  0).astype(np.int32)
    print(f"chunks/band-tile: mean {nq.mean():.2f} max {nq.max()}"
          f" (full window = {WINDOW // PACK // CHUNK})")
    nq = jnp.asarray(nq)

    # sliding-pair layout: row q = voxels [2q : 2q+4] as 128 lanes
    def _slide_pack(f):
        fp2 = f.astype(jnp.bfloat16).reshape(capacity // 2, 2 * C)
        return jnp.concatenate([fp2, jnp.roll(fp2, -1, axis=0)], axis=1)

    gsets = [jax.jit(_slide_pack)(f) for f in feats]

    one = jax.jit(run_variant, static_argnames=("variant",))
    CHAIN = 10
    ref_out = None
    for variant in ("prod", "v13_slide"):
        fs = gsets if variant == "v13_slide" else fsets
        try:
            out = one(spans.lo, n_live, spans.rd, nq, fs[0], w_band,
                      variant)
            out_np = np.asarray(out)[:n]
            # compile+warm the chained program before timing
            jax.block_until_ready(run_chained(
                spans.lo, n_live, spans.rd, nq, fs[0], w_band, variant,
                CHAIN))
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
            jax.block_until_ready(run_chained(
                spans.lo, n_live, spans.rd, nq, fs[i % 3], w_band, variant,
                CHAIN))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0) / CHAIN
        print(f"{variant:10s} {per*1e3:7.2f} ms/conv   maxerr {err:.4f}")


if __name__ == "__main__":
    main()
