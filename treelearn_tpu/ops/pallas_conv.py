"""Pallas TPU kernels for the sparse convolutions: packed banded gather-GEMM.

Why: XLA's row gather on TPU runs at a few GB/s (measured 4.5 GB/s for
(1M, 32)-bf16 rows on v5e), making gathers ~95% of submanifold conv time.
But our rulebooks have structure XLA cannot see:

1. Voxel keys are *sorted* and a fixed kernel offset shifts every key by the
   same delta, so each rulebook column ``rule[k]`` is monotonically
   non-decreasing over live rows.  Hence for an output tile of T consecutive
   voxels, all its inputs for offset k lie in a *contiguous* window of the
   feature array.
2. Keys are encoded z-fastest (ops/hashing.py:33) and the 27 kernel offsets
   are ordered dz-fastest (ops/sparse.py:kernel_offsets), so the three
   dz ∈ {-1,0,+1} neighbors of one output share a (dx,dy) *band*: their keys
   are the consecutive integers K-1, K, K+1, and therefore the ones that
   exist sit in ≤3 *consecutive slots* of the sorted voxel array.

The kernel exploits both.  Features are materialized in a *sliding-pair*
layout ``G[q] = [x_{2q} | x_{2q+1} | x_{2q+2} | x_{2q+3}]`` (stride-2 rows of
4·C lanes — one cheap XLA concat+roll per conv call), so that ANY 3-slot
candidate run [r0, r0+2] lives in the single row q0 = r0 >> 1 at lane phase
m = r0 & 1 ∈ {0, 1}.  Per (tile, band) the kernel DMAs ONE contiguous window
of G (full-bandwidth sequential read, 9 DMAs instead of 27), fetches each
output's run with one one-hot matmul on the MXU, and selects lane groups by
a 4-phase (m + dz-delta ∈ [0, 3]) masked select on the VPU:

    O[t, q]  = (r0[t]>>1 - lo == q)                  # (T, W/2) one-hot, VPU
    g        = O @ window                            # ONE MXU GEMM, (T, 4C)
    sel_k[t] = lane-group (r0[t]&1 + d_k[t]) of g    # 4-phase VPU select

and applies all 27 weight matrices as ONE wide GEMM at the end:

    out_tile = [sel_0 | sel_1 | … | sel_26] @ vstack(W_k)        # MXU

Relative to the per-offset unpacked form this cuts window HBM traffic ~4.5×
and selection-GEMM FLOPs ~4×; relative to the round-2 4-voxel-packed layout
(two row GEMMs + 6-phase select) it is ~1.25× faster at the hot L0 shape
(scripts/ablate_conv4.py: 19.3 → 15.4 ms at tile 256, window 768).

Window residency is double-buffered across bands.  Entries whose input falls
outside the window (possible only in pathological density jumps) are counted
by :func:`rule_spans`; callers fall back to the XLA path via ``lax.cond``
when any would be dropped, so results are always exact.  Reference
semantics: spconv SubMConv3d (reference blocks.py:57).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (tile, window) = (256, 768): fastest ok=True config of the round-3 sweep
# (scripts/ablate_conv4.py: slide 15.0 ms at window 640, 15.4 at 768, 16.1
# at 1024; 128/512 was 19.5).  The within-tile index spread scales with the
# tile, so the window scales with it — T=256 over 512-voxel windows (ratio
# 2) overflowed on centered plots; ratio 3 keeps headroom and overflows
# still fall back exactly via the spans-ok flag.  The window is in *voxels*;
# the kernel uses stride-2 rows (window/2 DMA rows of 4C lanes).
DEFAULT_TILE = 256
DEFAULT_WINDOW = 768
# window starts are aligned down to 64 voxels so the stride-2 row DMA start
# (lo/2) is a multiple of the bf16 sublane tile (16 ≤ 32)
_ALIGN = 64

# interpreter mode for CPU-side testing of the kernels
_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"

# dz-select formulation (see _gather_bands):
#   "legacy" — round-3 4-phase select into a (T, 3C) plane (production)
#   "roll"   — full-128-lane miss-form: per-row miss-count chained lane
#              rolls of the (T, 4C) gather row; rolls run in f32 (Mosaic's
#              tpu.dynamic_rotate is unimplemented for bf16).  A/B via
#              scripts/ablate_conv6.py before promoting.
_SELECT_MODE = os.environ.get("TL_CONV_SELECT", "legacy")


def _sel_groups() -> int:
    """Lane groups of the band plane handed to consume(): 4 (roll mode,
    group 3 always zero) or 3 (legacy)."""
    return 4 if _SELECT_MODE == "roll" else 3

# python int, NOT jnp.int32: a module-level concrete jnp array becomes a
# hoisted constant buffer in every program that closes over it, which
# interacts badly with jax 0.9 executable caches (see pipeline/inference.py)
_BIG = 2**30


class BandSpans(NamedTuple):
    """Level-shared banded-window precompute of a (27, V) submanifold rule.

    All convs sharing a rulebook (all blocks of a U-Net level — the spconv
    ``indice_key`` group) share one spans computation; build it once per
    level (model/blocks.py:build_level_plans) and pass it to
    :func:`rule_conv_fast` / :func:`rule_conv_ad`.
    """

    lo: jnp.ndarray   # (9, ntiles) int32 window starts, in voxels, 64-aligned
    rd: jnp.ndarray   # (9, V) int32 packed band word: r0*64 | dz-delta fields
                      #   r0 = rd >> 6: base slot of the band's 3-slot run
                      #   ((rd >> 2*dz) & 3) - 1: slot delta in [0, 2], -1 invalid
                      #   rd == -1: no valid dz neighbor in this band
    ok: jnp.ndarray   # () bool: every valid entry is in-window → fast path exact


def _pack_of(cin: int):
    """(pack, c_unit) of the HISTORICAL 4-voxel-packed layout — kept only for
    level_tile_window's window-scaling heuristic; the kernels now use the
    sliding-pair layout (see :func:`_cunit_of` / :func:`_slide_feats`)."""
    if cin <= 32:
        return 4, 32
    if cin <= 64:
        return 2, 64
    return 1, _cunit_of(cin)


def _cunit_of(cin: int) -> int:
    """Padded per-voxel channel count (lane-group width of the slide rows)."""
    for c in (32, 64, 128, 256, 512):
        if cin <= c:
            return c
    raise NotImplementedError(f"cin={cin} > 512")


def rule_spans(rule: jnp.ndarray, tile: int, window: int, v: int) -> BandSpans:
    """Precompute the banded-window metadata of a (27, V_out) submanifold
    rulebook over a V-row input array: see :class:`BandSpans`.

    ``ok`` is True iff every valid entry satisfies ``r0 - lo <= window - 8``,
    which guarantees the sliding-pair row q0 = r0>>1 (covering slots
    [2*q0, 2*q0+3] ⊇ [r0, r0+2]) is inside the window/2-row window.
    """
    k, n = rule.shape
    assert k == 27, k
    ntiles = n // tile
    rb = rule.reshape(9, 3, n)
    valid = rb >= 0
    r0 = jnp.min(jnp.where(valid, rb, _BIG), axis=1)          # (9, n)
    d = jnp.where(valid, rb - r0[:, None, :], -1)             # in [0, 2] / -1
    r0 = jnp.where(r0 == _BIG, -1, r0)
    dz_sh = jnp.arange(3, dtype=jnp.int32)[:, None] * 2
    fields = jnp.sum((d + 1) << dz_sh[None, :, :], axis=1)    # (9, n) 6 bits
    rd = jnp.where(r0 >= 0, r0 * 64 + fields, -1).astype(jnp.int32)

    rt = r0.reshape(9, ntiles, tile)
    lo = jnp.min(jnp.where(rt >= 0, rt, _BIG), axis=2)        # (9, ntiles)
    lo = jnp.where(lo == _BIG, 0, lo)
    lo = (lo // _ALIGN) * _ALIGN
    lo = jnp.clip(lo, 0, max(v - window, 0)).astype(jnp.int32)

    rel = rt - lo[:, :, None]
    bad = (rt >= 0) & ((rel < 0) | (rel > window - 8))
    ok = ~jnp.any(bad)
    return BandSpans(lo=lo, rd=rd, ok=ok)


def banded_spans_ok(rule: jnp.ndarray, tile: int, window: int, v: int):
    """() bool — see :func:`rule_spans`."""
    return rule_spans(rule, tile, window, v).ok


def _lo_rows(lo: jnp.ndarray) -> jnp.ndarray:
    """(9, ntiles) window starts -> (ntiles_pad8, 16) int32 for the per-tile
    SMEM BlockSpec: the kernels stream one (8, 16) block per 8 tiles and read
    row t % 8.  Replaces scalar-prefetching the whole table, whose SMEM
    residency capped whole-plot capacity at 2^22 voxels (9 * ntiles * 4 B vs
    the ~1 MB SMEM budget) and forced tiles to grow with capacity
    (VERDICT r4 items 4/5).  Mosaic's SMEM block rule (last-two dims (8k,
    cols) with cols == array cols) sets the (8, 16) shape."""
    ntiles = lo.shape[1]
    pad = (-ntiles) % 8
    rows = jnp.zeros((ntiles + pad, 16), jnp.int32)
    return rows.at[:ntiles, :9].set(lo.T)


def _gather_bands(t, lo_ref, rd_ref, feats_hbm, window_buf, sems, consume,
                  *, window_rows, tile, c_unit):
    """Shared gather stage: per band b in [0, 9), gather each output's three
    dz-neighbor feature rows via a banded one-hot MXU gather over the
    sliding-pair window and hand the lane-concatenated (T, 3*c_unit) bf16
    result to ``consume(b, band_cat)``.

    ``feats_hbm`` is the slide layout (V/2, 4*c_unit): row q = voxels
    [2q : 2q+4].  The candidate run [r0, r0+2] lives entirely in row
    q0 = r0 >> 1 (even r0 covers r0..r0+3, odd covers r0-1..r0+2), at lane
    phase m = r0 & 1, so ONE one-hot GEMM fetches it and the dz select needs
    only the 4 phases m + dd ∈ [0, 3].

    fori_loop (NOT a python loop) over the 9 bands: the unrolled body costs
    ~0.5 MB of VLIW code per band and the model instantiates ~65 of these
    kernels — unrolling once produced a 741 MB executable whose upload to the
    device dominated end-to-end time.  Double-buffering works unchanged:
    band b waits on slot b%2 while b+1 streams into the other slot.
    """

    lr = jax.lax.rem(t, 8)  # row of the (8, 16) SMEM lo block (see _lo_rows)

    def dma(b_idx, slot):
        start = pl.multiple_of(lo_ref[lr, b_idx] // 2, _ALIGN // 2)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start, window_rows), :],
            window_buf.at[slot],
            sems.at[slot],
        )

    dma(0, 0).start()
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window_rows), 1)

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < 9)
        def _():
            dma(b + 1, jax.lax.rem(b + 1, 2)).start()

        dma(b, slot).wait()

        rd = rd_ref[b, :]                                   # (T,) int32
        has = rd >= 0
        r0 = jax.lax.shift_right_arithmetic(rd, 6)
        lo_row = lo_ref[lr, b] // 2
        q0 = jnp.clip(jax.lax.shift_right_arithmetic(r0, 1) - lo_row,
                      0, window_rows - 1)
        # validity is folded into the index (-1 matches no column):
        # Mosaic cannot broadcast 1-D bools into a minor dim
        q0m = jnp.where(has, q0, -1)
        onehot = (q0m[:, None] == col_ids)
        g = jnp.dot(onehot.astype(jnp.bfloat16), window_buf[slot],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        m = jax.lax.bitwise_and(r0, 1)

        if _SELECT_MODE == "roll":
            # full-lane miss-form select.  Destination lane group dz must
            # receive g[m + dd_dz]; write dd = dz - miss (dd is dz's rank
            # among existing neighbors, so miss = #missing neighbors below
            # dz, in [0, dz]).  Then the target is g[(dz + m) - miss]:
            #   A  = m-selected base plane (group dz holds g[dz + m]):
            #        one uniform lane roll + one row-broadcast select;
            #   sel = sum_k (miss_plane == k) * roll(A, k*c_unit):
            #        each roll moves every group's source down one slot.
            # Every operand is the full (T, 4*c_unit) register width — no
            # 96/32-lane views — and the op count is ~2/3 of the 4-phase
            # select (ablate_conv3: the select sits at the vreg-op roofline,
            # so fewer full-width ops is the only lever).
            # Wrap safety: group 3 is masked (miss=-1); miss>=1 never occurs
            # at group 0; A's wrap (group 3 <- g0 when m=1) is masked too.
            dd0 = jax.lax.bitwise_and(rd, 3) - 1
            dd1 = jax.lax.bitwise_and(jax.lax.shift_right_logical(rd, 2), 3) - 1
            dd2 = jax.lax.bitwise_and(jax.lax.shift_right_logical(rd, 4), 3) - 1
            miss = [jnp.where(has & (dd >= 0), jnp.float32(dz) - dd, -1.0)
                    for dz, dd in enumerate((dd0, dd1, dd2))]
            lane4 = jax.lax.broadcasted_iota(
                jnp.int32, (tile, 4 * c_unit), 1) // c_unit
            mp = jnp.where(
                lane4 == 0, miss[0][:, None],
                jnp.where(lane4 == 1, miss[1][:, None],
                          jnp.where(lane4 == 2, miss[2][:, None], -1.0)))
            # rolls in f32: Mosaic's lane rotate is 32-bit-only.  The m
            # predicate is materialized full-width from int32 — a (T,) bool
            # reshaped to (T,1) hits Mosaic's "minor-dim insertion is
            # 32-bit-only" wall
            gf = g.astype(jnp.float32)
            a1 = pltpu.roll(gf, shift=3 * c_unit, axis=1)  # group dz <- g[dz+1]
            m_plane = jnp.broadcast_to(m[:, None], (tile, 4 * c_unit))
            A = jnp.where(m_plane == 1, a1, gf)
            sel_cat = jnp.where(mp == 0, A, 0)
            Ar = pltpu.roll(A, shift=c_unit, axis=1)       # group dz <- A[dz-1]
            sel_cat = sel_cat + jnp.where(mp == 1, Ar, 0)
            Arr = pltpu.roll(Ar, shift=c_unit, axis=1)
            sel_cat = sel_cat + jnp.where(mp == 2, Arr, 0)
            consume(b, sel_cat.astype(jnp.bfloat16))         # (T, 4*c_unit)
            return _

        # legacy fused wide select: one (T, 3*c_unit) phase plane serves all
        # three dz lanes at once — the per-dz (T, c_unit) form wasted 3/4 of
        # the VPU lanes at c_unit=32 and was 58% of kernel time (ablation in
        # scripts/ablate_conv.py).
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
        for pv in range(4):
            blk = g[:, pv * c_unit:(pv + 1) * c_unit]
            wide = jnp.concatenate([blk, blk, blk], axis=1)
            sel_cat = sel_cat + jnp.where(ph_plane == pv, wide, 0)
        consume(b, sel_cat)                                  # (T, 3*c_unit)
        return _

    jax.lax.fori_loop(0, 9, body, None, unroll=False)


def _subm_kernel(n_live_ref, lo_ref, rd_ref, feats_hbm, w_ref, out_ref,
                 window_buf, acc_ref, sems, *, window_rows, tile,
                 c_unit, out_dtype):
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    # capacity padding: tiles entirely past the live rows do no work
    @pl.when(t * tile < n_live_ref[0])
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def consume(b, band_cat):
            # w_ref[b] is the (3*c_unit, Cout) stack of this band's weights
            acc_ref[:] += jnp.dot(band_cat, w_ref[b],
                                  preferred_element_type=jnp.float32)

        _gather_bands(t, lo_ref, rd_ref, feats_hbm, window_buf, sems,
                      consume, window_rows=window_rows, tile=tile,
                      c_unit=c_unit)
        out_ref[:] = acc_ref[:].astype(out_dtype)


def _slide_feats(feats: jnp.ndarray, c_unit: int) -> jnp.ndarray:
    """(V, Cin) -> sliding-pair layout (V/2, 4*c_unit): row q = voxels
    [2q : 2q+4] (bf16, channel-padded).  One concat+roll at HBM bandwidth per
    conv call; the wrap of the last row is never selected (slots >= V cannot
    be valid rulebook entries)."""
    v, cin = feats.shape
    fb = feats.astype(jnp.bfloat16)
    if cin != c_unit:
        fb = jnp.pad(fb, ((0, 0), (0, c_unit - cin)))
    f2 = fb.reshape(v // 2, 2 * c_unit)
    return jnp.concatenate([f2, jnp.roll(f2, -1, axis=0)], axis=1)


def _band_weight(weight: jnp.ndarray, c_unit: int) -> jnp.ndarray:
    """(27, Cin, Cout) -> (9, G*c_unit, Cout) bf16 per-band stacked weights
    (G = _sel_groups()), zero rows for the Cin->c_unit channel padding and —
    in roll mode — for the always-zero 4th lane group of the band plane."""
    k, cin, cout = weight.shape
    wb = weight.astype(jnp.bfloat16)
    if cin != c_unit:
        wb = jnp.pad(wb, ((0, 0), (0, c_unit - cin), (0, 0)))
    g = _sel_groups()
    wb = wb.reshape(9, 3, c_unit, cout)
    if g == 4:
        wb = jnp.pad(wb, ((0, 0), (0, 1), (0, 0), (0, 0)))
    return wb.reshape(9, g * c_unit, cout)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def subm_conv_banded(feats: jnp.ndarray, weight: jnp.ndarray,
                     rule: Optional[jnp.ndarray], live_mask: jnp.ndarray,
                     tile: int = DEFAULT_TILE,
                     window: int = DEFAULT_WINDOW,
                     spans: Optional[BandSpans] = None) -> jnp.ndarray:
    """Packed banded Pallas submanifold conv (unchecked fast path).

    feats (V, Cin) any float dtype; weight (27, Cin, Cout); rule (27, V) —
    may be None when ``spans`` is given (the rd-kernel flow,
    ops/pallas_rd.py, never materializes the rule).  V must be a multiple of
    ``tile`` and >= ``window`` (both in voxels).
    """
    v, cin = feats.shape          # input rows (gather source)
    v_out = rule.shape[1] if rule is not None else spans.rd.shape[1]
    k, _, cout = weight.shape
    assert k == 27 and v_out % tile == 0 and v >= window, (k, v, v_out)
    ntiles = v_out // tile
    c_unit = _cunit_of(cin)
    window_rows = window // 2

    if spans is None:
        spans = rule_spans(rule, tile, window, v)
    feats_p = _slide_feats(feats, c_unit)
    w_band = _band_weight(weight, c_unit)
    n_live = jnp.sum(live_mask).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((8, 16), lambda t, nl: (t // 8, 0),
                         memory_space=pltpu.SMEM),               # lo rows
            pl.BlockSpec((9, tile), lambda t, nl: (0, t)),       # rd tile
            pl.BlockSpec(memory_space=pltpu.HBM),                # slide feats
            pl.BlockSpec(memory_space=pltpu.VMEM),               # flat weights
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, 4 * c_unit), jnp.bfloat16),
            pltpu.VMEM((tile, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_subm_kernel, window_rows=window_rows, tile=tile,
                          c_unit=c_unit, out_dtype=feats.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(n_live, _lo_rows(spans.lo), spans.rd, feats_p, w_band)
    return jnp.where(live_mask[:, None], out, 0)


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dW[k] = sum_i x[rule[k, i]] g[i]^T
# ---------------------------------------------------------------------------

def _dw_kernel(n_live_ref, lo_ref, rd_ref, g_ref, x_hbm, out_ref,
               window_buf, sems, *, window_rows, tile, c_unit):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * tile < n_live_ref[0])
    def _():
        def consume(b, band_cat):
            # (3*c_unit, T) @ (T, Cout) outer-product accumulate per band
            out_ref[b] += jax.lax.dot_general(
                band_cat, g_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        _gather_bands(t, lo_ref, rd_ref, x_hbm, window_buf, sems,
                      consume, window_rows=window_rows, tile=tile,
                      c_unit=c_unit)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def rule_conv_dw_banded(x: jnp.ndarray, g: jnp.ndarray, rule: jnp.ndarray,
                        live_mask: jnp.ndarray, tile: int = DEFAULT_TILE,
                        window: int = DEFAULT_WINDOW,
                        spans: Optional[BandSpans] = None) -> jnp.ndarray:
    """Weight gradient of a rulebook conv: (27, Cin, Cout) f32.

    x (V_in, Cin) inputs, g (V_out, Cout) output cotangents (must already be
    zero on dead rows).  Same banded windows as the forward; each tile adds a
    (27·Cin, Cout) outer-product GEMM into a VMEM-resident accumulator.
    ``rule`` may be None when ``spans`` is given (rd-kernel flow).
    """
    v, cin = x.shape
    v_out, cout = g.shape
    assert (rule is None or rule.shape[0] == 27) and v_out % tile == 0 \
        and v >= window
    c_unit = _cunit_of(cin)
    window_rows = window // 2

    if spans is None:
        spans = rule_spans(rule, tile, window, v)
    x_p = _slide_feats(x, c_unit)
    g_b = jnp.where(live_mask[:, None], g, 0).astype(jnp.bfloat16)
    n_live = jnp.sum(live_mask).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v_out // tile,),
        in_specs=[
            pl.BlockSpec((8, 16), lambda t, nl: (t // 8, 0),
                         memory_space=pltpu.SMEM),                # lo rows
            pl.BlockSpec((9, tile), lambda t, nl: (0, t)),        # rd tile
            pl.BlockSpec((tile, cout), lambda t, nl: (t, 0)),     # g tile
            pl.BlockSpec(memory_space=pltpu.HBM),                 # x windows
        ],
        out_specs=pl.BlockSpec((9, _sel_groups() * c_unit, cout),
                               lambda t, nl: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window_rows, 4 * c_unit), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, window_rows=window_rows, tile=tile,
                          c_unit=c_unit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, _sel_groups() * c_unit, cout),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(n_live, _lo_rows(spans.lo), spans.rd, g_b, x_p)
    # slice the dz groups back out (roll mode appends an always-zero 4th)
    dw = dw.reshape(9, _sel_groups(), c_unit, cout)[:, :3]
    return dw.reshape(27, c_unit, cout)[:, :cin, :]


def rule_conv_fast(feats: jnp.ndarray, weight: jnp.ndarray, rule: jnp.ndarray,
                   live_mask: jnp.ndarray, tile: int = DEFAULT_TILE,
                   window: int = DEFAULT_WINDOW,
                   center_identity: bool = False,
                   spans: Optional[BandSpans] = None,
                   fallback: str = "xla",
                   rule_thunk=None) -> jnp.ndarray:
    """Exact submanifold rulebook conv: Pallas packed-banded path when every
    rulebook entry is in-window (the overwhelmingly common case on sorted
    voxel data), selected at runtime by ``lax.cond``.  ``spans`` is the
    level-shared :class:`BandSpans` from :func:`rule_spans`.

    ``fallback`` picks the out-of-window branch:
    * "xla": the scan-gather conv — always exact, costs ~1.5 MB of extra
      executable per conv instance.
    * "zeros": returns zeros; the CALLER must surface the span-ok flags to
      the host (model output ``spans_ok``) and re-dispatch the batch on a
      fallback program when any is False.  This keeps the hot program free
      of ~40 never-taken branch bodies (executable upload to the tunneled
      device is the end-to-end bottleneck).

    ``rule=None`` (requires spans) is the rd-kernel flow: the (27, V) rule is
    never materialized on the fast path (ops/pallas_rd.py).  With
    fallback="xla" a ``rule_thunk`` must then supply the rule INSIDE the
    slow branch — lax.cond branch bodies only execute when taken, so the
    27-probe rulebook build is paid exclusively by overflowing batches."""
    from .sparse import subm_conv

    v = feats.shape[0]
    if rule is None:
        assert spans is not None and (fallback == "zeros"
                                      or rule_thunk is not None), (
            "rule=None needs precomputed spans and either the zeros fallback "
            "or a rule_thunk for the in-branch XLA fallback")
        v_out = spans.rd.shape[1]
        assert v_out % tile == 0 and v >= window
    else:
        v_out = rule.shape[1]
        if rule.shape[0] != 27 or v_out % tile != 0 or v < window:
            return subm_conv(feats, weight, rule, live_mask,
                             center_identity=center_identity)

    if spans is None:
        spans = rule_spans(rule, tile, window, v)
    if fallback == "zeros":
        slow = lambda f: jnp.zeros((v_out, weight.shape[2]), f.dtype)
    else:
        slow = lambda f: subm_conv(
            f, weight.astype(f.dtype),
            rule if rule is not None else rule_thunk(), live_mask,
            center_identity=center_identity)
    return jax.lax.cond(
        spans.ok,
        lambda f: subm_conv_banded(f, weight, rule, live_mask, tile, window,
                                   spans=spans),
        slow,
        feats,
    )


def subm_conv_fast(feats, weight, rule, live_mask, tile: int = DEFAULT_TILE,
                   window: int = DEFAULT_WINDOW,
                   spans: Optional[BandSpans] = None):
    """Submanifold conv dispatch (center column of the rule is the identity)."""
    return rule_conv_fast(feats, weight, rule, live_mask, tile, window,
                          center_identity=True, spans=spans)


def rule_conv_dw_xla(x: jnp.ndarray, g: jnp.ndarray, rule: jnp.ndarray,
                     live_mask: jnp.ndarray) -> jnp.ndarray:
    """XLA fallback weight gradient (gather-based, scanned over offsets)."""
    v = x.shape[0]
    g = jnp.where(live_mask[:, None], g, 0).astype(jnp.float32)

    def body(_, idx):
        gathered = x[jnp.clip(idx, 0, v - 1)].astype(jnp.float32)
        gathered = jnp.where((idx >= 0)[:, None], gathered, 0.0)
        return None, gathered.T @ g

    _, dw = jax.lax.scan(body, None, rule)
    return dw


# ---------------------------------------------------------------------------
# Differentiable rulebook conv (custom VJP)
# ---------------------------------------------------------------------------
#
# pallas_call has no automatic VJP, but rulebook convs transpose beautifully:
# the relation rule[k][i] = j is inverted by the *paired* rule (the mirrored
# offset for submanifold convs), so dx is the same banded kernel with
# transposed weights, and dW is one extra banded pass accumulating per-tile
# outer products.

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def rule_conv_ad(feats, weight, rule, rule_t, live_out, live_in,
                 spans, spans_t,
                 mirror: bool, center_identity: bool, tile_window=None,
                 fallback: str = "xla", rule_thunk=None):
    """Differentiable rulebook conv.  ``spans``/``spans_t`` are the shared
    :class:`BandSpans` precomputes of ``rule``/``rule_t`` (see
    :func:`rule_spans`); pass None to compute them inline.  ``fallback`` and
    ``rule_thunk`` as in :func:`rule_conv_fast`."""
    tile, window = tile_window or (DEFAULT_TILE, DEFAULT_WINDOW)
    return rule_conv_fast(feats, weight, rule, live_out, tile, window,
                          center_identity=center_identity, spans=spans,
                          fallback=fallback, rule_thunk=rule_thunk)


def _rule_conv_ad_fwd(feats, weight, rule, rule_t, live_out, live_in,
                      spans, spans_t, mirror, center_identity, tile_window,
                      fallback, rule_thunk):
    out = rule_conv_ad(feats, weight, rule, rule_t, live_out, live_in,
                       spans, spans_t, mirror, center_identity, tile_window,
                       fallback, rule_thunk)
    return out, (feats, weight, rule, rule_t, live_out, live_in, spans, spans_t)


def _rule_conv_ad_bwd(mirror, center_identity, tile_window, fallback,
                      rule_thunk, res, g):
    tile, window = tile_window or (DEFAULT_TILE, DEFAULT_WINDOW)
    feats, weight, rule, rule_t, live_out, live_in, spans, spans_t = res
    g = jnp.where(live_out[:, None], g, 0)

    wt = weight[::-1] if mirror else weight
    wt = wt.transpose(0, 2, 1)
    dx = rule_conv_fast(g, wt, rule_t, live_in, tile, window,
                        center_identity=center_identity, spans=spans_t,
                        fallback=fallback, rule_thunk=rule_thunk)
    dx = dx.astype(feats.dtype)

    v = feats.shape[0]
    v_out = rule.shape[1] if rule is not None else spans.rd.shape[1]
    if (rule is None or rule.shape[0] == 27) and v_out % tile == 0 \
            and v >= window:
        sp = spans if spans is not None else rule_spans(rule, tile, window, v)
        if fallback == "zeros" or (rule is None and rule_thunk is None):
            slow = lambda a: jnp.zeros(
                (27, a[0].shape[1], a[1].shape[1]), jnp.float32)
        else:
            slow = lambda a: rule_conv_dw_xla(
                a[0], a[1], rule if rule is not None else rule_thunk(),
                live_out)
        dw = jax.lax.cond(
            sp.ok,
            lambda a: rule_conv_dw_banded(a[0], a[1], rule, live_out, tile,
                                          window, spans=sp),
            slow,
            (feats, g),
        )
    else:
        dw = rule_conv_dw_xla(feats, g, rule, live_out)
    return (dx, dw.astype(weight.dtype), None, None, None, None, None, None)


rule_conv_ad.defvjp(_rule_conv_ad_fwd, _rule_conv_ad_bwd)
