"""Round-3 conv ablation: dy-shared windows + software pipelining.

Premise (scripts/check_trio_spread.py): the 3 dy-bands of a dx-group have
nearly identical slot windows — trio spread is only ~25 slots wider than one
band's (dy=+-1 shifts keys by one z-column ~ 2 slots).  So the 9 per-band
window DMAs can become 3 per-group DMAs at the same window size, and the 3
one-hot gather GEMMs of a group can batch into one (3T, Wr) GEMM.

Variants:
  prod      — current production sliding-pair kernel (9 DMAs, 4-phase select)
  dy3       — 3 shared window DMAs, batched (3T, Wr) one-hot, same select
  dy3_pipe  — dy3 + 2-stage software pipeline: group g's select/weight-GEMM
              (VPU-heavy) overlaps group g+1's gather GEMM (MXU) and DMA
  dy3_fma   — dy3_pipe + bf16 phase plane and mask-FMA select (fewer int32
              vreg-ops)

Usage: python scripts/ablate_conv5.py
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
from treelearn_tpu.ops.pallas_conv import (rule_spans, _slide_feats,
                                           _band_weight)

TILE = int(os.environ.get("ABL_TILE", 256))
WINDOW = int(os.environ.get("ABL_WINDOW", 768))
_ALIGN = 64
C = 32


def _phase_select(rd, g, tile, c):
    """Production 4-phase select: g (T, 4c) -> sel_cat (T, 3c)."""
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


def _phase_select_fma(rd, g, tile, c):
    """bf16 phase plane + mask-FMA accumulation (no int32 plane compares)."""
    has = rd >= 0
    r0 = jax.lax.shift_right_arithmetic(rd, 6)
    m = jax.lax.bitwise_and(r0, 1)
    phs = []
    for dz in range(3):
        dd = jax.lax.bitwise_and(
            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
        ph = jnp.where(has & (dd >= 0), m + dd, -1)
        phs.append(ph.astype(jnp.bfloat16))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (tile, 3 * c), 1) // c
    ph_plane = jnp.where(
        lane3 == 0, phs[0][:, None],
        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
    sel_cat = jnp.zeros((tile, 3 * c), jnp.bfloat16)
    for pv in range(4):
        blk = g[:, pv * c:(pv + 1) * c]
        wide = jnp.concatenate([blk, blk, blk], axis=1)
        mask = (ph_plane == jnp.bfloat16(pv)).astype(jnp.bfloat16)
        sel_cat = sel_cat + mask * wide
    return sel_cat


def make_kernel(variant, tile, cout):
    c = C
    window_rows = WINDOW // 2
    select = _phase_select_fma if variant == "dy3_fma" else _phase_select
    pipelined = variant in ("dy3_pipe", "dy3_fma")

    if variant == "prod":
        def kernel(lo_ref, n_live_ref, rd_ref, feats_hbm, w_ref, out_ref,
                   window_buf, acc_ref, gbuf, sems):
            t = pl.program_id(0)
            out_ref[:] = jnp.zeros_like(out_ref)

            @pl.when(t * tile < n_live_ref[0])
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

                def dma(b_idx, slot):
                    start = pl.multiple_of(lo_ref[b_idx, t] // 2, _ALIGN // 2)
                    return pltpu.make_async_copy(
                        feats_hbm.at[pl.ds(start, window_rows), :],
                        window_buf.at[slot], sems.at[slot])

                dma(0, 0).start()
                col_ids = jax.lax.broadcasted_iota(
                    jnp.int32, (tile, window_rows), 1)

                def body(b, _):
                    slot = jax.lax.rem(b, 2)

                    @pl.when(b + 1 < 9)
                    def _():
                        dma(b + 1, jax.lax.rem(b + 1, 2)).start()

                    dma(b, slot).wait()
                    rd = rd_ref[b, :]
                    has = rd >= 0
                    r0 = jax.lax.shift_right_arithmetic(rd, 6)
                    q0 = jnp.clip(
                        jax.lax.shift_right_arithmetic(r0, 1)
                        - lo_ref[b, t] // 2, 0, window_rows - 1)
                    q0m = jnp.where(has, q0, -1)
                    onehot = (q0m[:, None] == col_ids)
                    g = jnp.dot(onehot.astype(jnp.bfloat16), window_buf[slot],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                    sel = _phase_select(rd, g, tile, c)
                    acc_ref[:] += jnp.dot(sel, w_ref[b],
                                          preferred_element_type=jnp.float32)
                    return _

                jax.lax.fori_loop(0, 9, body, None, unroll=False)
                out_ref[:] = acc_ref[:].astype(jnp.bfloat16)
        return kernel

    def kernel(lo_ref, n_live_ref, rd_ref, feats_hbm, w_ref, out_ref,
               window_buf, acc_ref, gbuf, sems):
        t = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(t * tile < n_live_ref[0])
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

            def dma(g_idx, slot):
                start = pl.multiple_of(lo_ref[g_idx, t] // 2, _ALIGN // 2)
                return pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(start, window_rows), :],
                    window_buf.at[slot], sems.at[slot])

            dma(0, 0).start()
            col3 = jax.lax.broadcasted_iota(
                jnp.int32, (3 * tile, window_rows), 1)

            def gather(gi, slot):
                """Batched (3T, Wr) one-hot gather of group gi -> gbuf."""
                rd3 = rd_ref[pl.ds(gi * 3, 3), :]        # (3, T)
                rd3f = rd3.reshape(3 * tile)
                has = rd3f >= 0
                r0 = jax.lax.shift_right_arithmetic(rd3f, 6)
                q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, 1)
                              - lo_ref[gi, t] // 2, 0, window_rows - 1)
                q0m = jnp.where(has, q0, -1)
                onehot = (q0m[:, None] == col3)
                return jnp.dot(onehot.astype(jnp.bfloat16), window_buf[slot],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)

            def consume(gi, g3):
                for j in range(3):
                    rd = rd_ref[pl.ds(gi * 3 + j, 1), :].reshape(tile)
                    g = g3[j * tile:(j + 1) * tile, :]
                    sel = select(rd, g, tile, c)
                    acc_ref[:] += jnp.dot(
                        sel,
                        w_ref[pl.ds(gi * 3 + j, 1)].reshape(3 * c, cout),
                        preferred_element_type=jnp.float32)

            if not pipelined:
                def body(gi, _):
                    slot = jax.lax.rem(gi, 2)

                    @pl.when(gi + 1 < 3)
                    def _():
                        dma(gi + 1, jax.lax.rem(gi + 1, 2)).start()

                    dma(gi, slot).wait()
                    consume(gi, gather(gi, slot))
                    return _

                jax.lax.fori_loop(0, 3, body, None, unroll=False)
            else:
                def body(s, _):
                    @pl.when(s < 3)
                    def _():
                        slot = jax.lax.rem(s, 2)

                        @pl.when(s + 1 < 3)
                        def _():
                            dma(s + 1, jax.lax.rem(s + 1, 2)).start()

                        dma(s, slot).wait()
                        gbuf[slot] = gather(s, slot)

                    @pl.when(s > 0)
                    def _():
                        consume(s - 1, gbuf[jax.lax.rem(s - 1, 2)])
                    return _

                jax.lax.fori_loop(0, 4, body, None, unroll=False)

            out_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    return kernel


def run_variant(lo, n_live, rd, feats_p, w_band, variant):
    capacity = rd.shape[1]
    cout = w_band.shape[2]
    window_rows = WINDOW // 2
    ntiles = capacity // TILE
    nlo = 9 if variant == "prod" else 3
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
            pltpu.VMEM((2, window_rows, 4 * C), jnp.bfloat16),
            pltpu.VMEM((TILE, cout), jnp.float32),
            pltpu.VMEM((2, 3 * TILE, 4 * C), jnp.bfloat16),
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


@functools.partial(jax.jit, static_argnames=("variant", "chain"))
def run_chained(lo, n_live, rd, feats_p, w_band, variant, chain=10):
    def body(i, fp):
        out = run_variant(lo, n_live, rd, feats_p, w_band, variant)
        upd = out.reshape(fp.shape[0], -1)
        while upd.shape[1] < fp.shape[1]:
            upd = jnp.concatenate([upd, upd], axis=1)
        return fp + upd * jnp.bfloat16(1e-3)

    fp = jax.lax.fori_loop(0, chain, body, feats_p)
    # ONE scalar result: float() of it forces a genuine D2H sync — on the
    # tunneled backend jax.block_until_ready() of a device array can no-op
    # (docs/performance.md), silently timing only the dispatch
    return jnp.sum(fp[:8, :8].astype(jnp.float32))


def main():
    capacity = 1 << 19
    data, _ = make_synthetic_forest(n_trees=48, extent=60.0,
                                    points_per_tree=9000,
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
    g0 = grid_from_sorted_keys(
        k0, jnp.asarray(np.array([640, 640, 192], np.int32)), jnp.int32(n))
    table = build_dense_table(g0, 640 * 640 * 192)
    rule = jax.jit(lambda g, t: build_subm_rulebook(g, 3, dense_table=t))(
        g0, table)
    spans = jax.jit(lambda r: rule_spans(r, TILE, WINDOW, capacity))(rule)
    print("per-band spans ok:", bool(np.asarray(spans.ok)))

    # dy-shared group windows: lo3[g] = min over the trio, re-aligned; verify
    # every candidate run still fits the shared window
    lo_np = np.asarray(spans.lo)                       # (9, ntiles)
    lo3 = lo_np.reshape(3, 3, -1).min(axis=1)
    lo3 = (lo3 // _ALIGN) * _ALIGN
    lo3 = np.clip(lo3, 0, capacity - WINDOW).astype(np.int32)
    rb = np.asarray(rule).reshape(9, 3, capacity)
    rmax = np.max(np.where(rb >= 0, rb, -1), axis=1)   # (9, V)
    hi = rmax.reshape(9, -1, TILE).max(axis=2)         # (9, ntiles)
    hi3 = hi.reshape(3, 3, -1).max(axis=1)
    ok3 = bool(np.all((hi3 < 0) | (hi3 - lo3 <= WINDOW - 8)))
    print("trio-shared windows ok:", ok3)

    w = jnp.asarray(rng.normal(size=(27, C, C)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w_band = jax.jit(lambda ww: _band_weight(ww, C))(w)
    feats = [jnp.asarray(rng.normal(size=(capacity, C)).astype(np.float32),
                         jnp.bfloat16) for _ in range(3)]
    fsets = [jax.jit(lambda f_: _slide_feats(f_, C))(f) for f in feats]
    n_live = jnp.asarray([n], jnp.int32)
    lo3j = jnp.asarray(lo3)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    # exact oracle: the XLA gather conv on the same rule
    from treelearn_tpu.ops.sparse import subm_conv
    live = jnp.asarray(np.arange(capacity) < n)
    oracle = np.asarray(jax.jit(subm_conv)(
        feats[0], w.astype(jnp.bfloat16), rule, live))[:n]
    print(f"oracle |out| {np.abs(oracle.astype(np.float32)).sum():.1f}")

    one = jax.jit(run_variant, static_argnames=("variant",))
    CHAIN = 10
    ref_out = oracle
    for variant in ("prod", "dy3", "dy3_pipe", "dy3_fma"):
        lo_arg = spans.lo if variant == "prod" else lo3j
        try:
            out = one(lo_arg, n_live, spans.rd, fsets[0], w_band, variant)
            out_np = np.asarray(out)[:n]
            float(run_chained(
                lo_arg, n_live, spans.rd, fsets[0], w_band, variant, CHAIN))
        except Exception as e:
            print(f"{variant:10s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        err = float(np.max(np.abs(out_np.astype(np.float32)
                                  - ref_out.astype(np.float32))))
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            float(run_chained(
                lo_arg, n_live, spans.rd, fsets[i % 3], w_band, variant,
                CHAIN))
            best = min(best, time.perf_counter() - t0)
        per = max(best - rtt, 0) / CHAIN
        print(f"{variant:10s} {per*1e3:7.2f} ms/conv   maxerr {err:.4f}")


if __name__ == "__main__":
    main()
