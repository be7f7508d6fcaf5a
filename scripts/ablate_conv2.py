"""Candidate select-stage redesigns for the banded subm conv.

  full     — current kernel (baseline)
  widesel  — fused (T, 3*c_unit) select: one mask per pv over all dz lanes
  slotgemm — unpacked (W, 32) window; 3 slot-level one-hot GEMMs per band
"""

import os
import sys
import time
import functools

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

TILE = int(os.environ.get('ABL_TILE', 128))
WINDOW = int(os.environ.get('ABL_WINDOW', 512))
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

                if variant == "slotgemm":
                    # slot-level one-hot per dz on the unpacked (W, 32) window
                    lo_vox = lo_ref[b, t]
                    slot_ids = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, window_rows), 1)
                    rel = jnp.where(has, r0 - lo_vox, -1)
                    sels = []
                    for dz in range(3):
                        dd = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
                        tgt = jnp.where(has & (dd >= 0), rel + dd, -1)
                        oh = (tgt[:, None] == slot_ids).astype(jnp.bfloat16)
                        sels.append(jnp.dot(oh, window_buf[slot],
                                            preferred_element_type=jnp.float32
                                            ).astype(jnp.bfloat16))
                    acc_ref[:] += jnp.dot(jnp.concatenate(sels, axis=1),
                                          w_ref[b],
                                          preferred_element_type=jnp.float32)
                    return _

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

                if variant == "treesel":
                    # phm = m + dd_dz - dz per lane group; +2 biases into
                    # [0, 7]; candidates are CONTIGUOUS 96-lane views of the
                    # zero-padded [Z Z g_lo g_hi Z Z] concat, selected by a
                    # 3-bit binary tree (7 wheres) instead of 6-8 masked adds
                    phs = []
                    for dz in range(3):
                        dd = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
                        phs.append((jnp.where(has & (dd >= 0), m + dd - dz, -3)
                                    + 2))
                    lane3 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 3 * c_unit), 1) // c_unit
                    phm = jnp.where(
                        lane3 == 0, phs[0][:, None],
                        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
                    zpad = jnp.zeros((tile, 2 * c_unit), jnp.bfloat16)
                    g_pad = jnp.concatenate([zpad, g_lo, g_hi, zpad], axis=1)
                    V = [g_pad[:, c_unit * k: c_unit * (k + 3)]
                         for k in range(8)]
                    b0 = jax.lax.bitwise_and(phm, 1) > 0
                    b1 = jax.lax.bitwise_and(phm, 2) > 0
                    b2 = jax.lax.bitwise_and(phm, 4) > 0
                    u = [jnp.where(b0, V[2 * j + 1], V[2 * j]) for j in range(4)]
                    v = [jnp.where(b1, u[2 * j + 1], u[2 * j]) for j in range(2)]
                    w_sel = jnp.where(b2, v[1], v[0])
                    sel_cat = jnp.where(phm >= 0, w_sel, 0)
                    acc_ref[:] += jnp.dot(sel_cat, w_ref[b],
                                          preferred_element_type=jnp.float32)
                    return _

                if variant == "widesel":
                    # ph per dz, broadcast to a (T, 3*c_unit) phase plane
                    phs = []
                    for dz in range(3):
                        dd = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(rd, 2 * dz), 3) - 1
                        phs.append(jnp.where(has & (dd >= 0), m + dd, -1))
                    lane3 = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 3 * c_unit), 1) // c_unit
                    ph_plane = jnp.where(
                        lane3 == 0, phs[0][:, None],
                        jnp.where(lane3 == 1, phs[1][:, None], phs[2][:, None]))
                    sel_cat = jnp.zeros((tile, 3 * c_unit), jnp.bfloat16)
                    for pv in range(pack + 2):
                        src = g_lo if pv < pack else g_hi
                        lane = (pv % pack) * c_unit
                        blk = src[:, lane:lane + c_unit]
                        wide = jnp.concatenate([blk, blk, blk], axis=1)
                        sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
                    acc_ref[:] += jnp.dot(sel_cat, w_ref[b],
                                          preferred_element_type=jnp.float32)
                    return _

                # full (baseline)
                sels = []
                for dz in range(3):
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
    cout = w_band.shape[2]
    if variant == "slotgemm":
        pack, c_unit = 1, 32
        window_rows = WINDOW          # (W, 32) unpacked
    else:
        pack, c_unit = 4, 32
        window_rows = WINDOW // 4
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
            pltpu.VMEM((2, window_rows, (4 if variant != "slotgemm" else 1)
                        * c_unit), jnp.bfloat16),
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

    w = jnp.asarray(rng.normal(size=(27, 32, 32)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w_band = jax.jit(lambda ww: _band_weight(ww, 32))(w)
    feats = [jnp.asarray(rng.normal(size=(capacity, 32)).astype(np.float32),
                         jnp.bfloat16) for _ in range(3)]
    packed = [jax.jit(lambda f_: _pack_feats(f_, 4, 32))(f_) for f_ in feats]
    unpacked = [jax.jit(lambda f_: _pack_feats(f_, 1, 32))(f_) for f_ in feats]
    n_live = jnp.asarray([n], jnp.int32)

    f_rtt = jax.jit(lambda x: x + 1)
    float(f_rtt(jnp.float32(0)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter(); float(f_rtt(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f}ms")

    ref = None
    for variant in ("full", "widesel", "treesel"):
        fs = unpacked if variant == "slotgemm" else packed
        out = run_variant(spans.lo, n_live, spans.rd, fs[0], w_band, variant)
        out_np = np.asarray(out, np.float32)
        if ref is None:
            ref = out_np
            err = 0.0
        else:
            err = float(np.max(np.abs(out_np - ref)))
        s = jax.jit(lambda o: jnp.sum(o).astype(jnp.float32))
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            float(s(run_variant(spans.lo, n_live, spans.rd, fs[i % 3], w_band,
                                variant)))
            best = min(best, time.perf_counter() - t0)
        print(f"{variant:9s} {max(best-rtt,0)*1e3:7.1f} ms   max|err|={err:.4f}")


if __name__ == "__main__":
    main()
