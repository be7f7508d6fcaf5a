"""Pallas TPU kernel: build banded submanifold rulebooks from sorted keys.

The XLA rulebook build (ops/sparse.py:build_subm_rulebook) probes a dense
direct-address table 27 times — 27 random gathers of V entries, ~220 ms for
V=512k on v5e (XLA's TPU gather runs at ~65M elements/s).  But the banded
conv kernels (ops/pallas_conv.py) never consume the (27, V) rule itself —
only its :class:`~treelearn_tpu.ops.pallas_conv.BandSpans` reduction
(lo, rd, ok).  This kernel produces the spans directly from the sorted key
array with zero gathers:

* Window starts ``lo[b, t]`` come from 9x2 searchsorted calls on the ~V/tile
  TILE-BOUNDARY keys only (cheap — the expensive per-voxel searchsorted is
  exactly what this module avoids), 128-aligned for the int32 row DMA.
* Per (tile, band) the kernel DMAs one contiguous (window/128, 128) block of
  the sorted keys and, for each query key K, locates the band's candidate
  run {K+D-1, K+D, K+D+1} by lane comparison: ``diff = win - (K+D-1)`` is in
  [0, 2] for present candidates, which are CONSECUTIVE slots (keys sorted,
  z-fastest encoding).  One masked min gives the run start r0; one masked
  sum of ``1 << diff`` gives the dz presence bitmask (each power appears at
  most once — keys are unique); the rd field encoding follows
  ops/pallas_conv.py:BandSpans.
* Boundary wraps are excluded on the QUERY side: a key comparison cannot
  tell voxel (x, y, 0) + dz=-1 from (x, y-1, sz-1), so per-band direction
  validity (x+dx, y+dy in range) and per-dz z-range bits are computed from
  the decoded query coordinate and folded into the candidate mask — exact
  parity with encode_keys' out-of-range SENTINEL semantics
  (ops/hashing.py:25-37).

``ok`` has the same guarantee as rule_spans: True iff every candidate run
lies within its window (margin 8 for the packed 2-row group), so callers'
fallback logic (model/network.py:SpansOverflow) is unchanged.

Reference semantics: spconv rulebook construction for SubMConv3d
(reference tree_learn/model/blocks.py:57, indice_key caching blocks.py:91).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashing import SENTINEL
from .pallas_conv import BandSpans

_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"
_ALIGN = 128   # lo alignment: int32 key rows are (128,) lanes (also a
               # multiple of pallas_conv's 64-voxel packed-row alignment)
_BIG = 2**30


def band_deltas(spatial_shape) -> list:
    """Key deltas of the 9 (dx, dy) bands, dz-fastest order — must match
    rule.reshape(9, 3, V) of build_subm_rulebook (kernel_offsets order)."""
    sx, sy, sz = int(spatial_shape[0]), int(spatial_shape[1]), int(spatial_shape[2])
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            out.append((dx, dy, dx * sy * sz + dy * sz))
    return out


def _rd_kernel(n_live_ref, lo_ref, q_ref, guard_ref, keys_hbm, out_ref,
               window_buf, sems, *, window, tile, deltas):
    t = pl.program_id(0)
    out_ref[:] = jnp.full_like(out_ref, -1)

    @pl.when(t * tile < n_live_ref[0])
    def _():
        rows = window // 128
        lr = jax.lax.rem(t, 8)  # row of the (8, 16) SMEM lo block

        def dma(b_idx, slot):
            start = pl.multiple_of(lo_ref[lr, b_idx] // 128, 1)
            return pltpu.make_async_copy(
                keys_hbm.at[pl.ds(start, rows), :],
                window_buf.at[slot], sems.at[slot])

        dma(0, 0).start()

        qk = q_ref[0, 0, :]                  # (T,) int32 sorted keys
        # guard word (XLA-precomputed, see build_spans_banded): bits 0-8 =
        # per-band (x+dx, y+dy) in-range, bit 9 = z > 0, bit 10 = z < sz-1.
        # In-kernel coordinate decode would need int div/rem by non-pow2
        # constants, which Mosaic lowers poorly — the guard costs one extra
        # (1, T) int32 block instead.
        g = guard_ref[0, 0, :]
        # int32 0/1 guards, not bool: Mosaic cannot insert a minor dim on
        # sub-32-bit types, so [:, None] broadcasts must stay 32-bit
        zb0 = jax.lax.bitwise_and(jax.lax.shift_right_logical(g, 9), 1)
        zb2 = jax.lax.bitwise_and(jax.lax.shift_right_logical(g, 10), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)

        for b, (dx, dy, delta) in enumerate(deltas):
            slot = b % 2
            if b + 1 < 9:
                dma(b + 1, (b + 1) % 2).start()
            dma(b, slot).wait()

            dir_ok = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(g, b), 1)
            base = qk + (delta - 1)

            lo_b = lo_ref[lr, b]
            bits_acc = jnp.zeros((tile, 128), jnp.int32)
            pos_acc = jnp.full((tile, 128), _BIG, jnp.int32)
            win = window_buf[slot]
            for r in range(rows):
                wrow = win[r, :][None, :]                  # (1, 128)
                diff = wrow - base[:, None]                # (T, 128)
                in_rng = (diff >= 0) & (diff <= 2)
                # z-validity per diff: diff==0 -> dz=-1 needs z>0;
                # diff==2 -> dz=+1 needs z<sz-1; diff==1 always ok
                allowed = jnp.where(
                    diff == 0, zb0[:, None],
                    jnp.where(diff == 2, zb2[:, None], 1))
                m = in_rng & ((allowed & dir_ok[:, None]) > 0)
                bitv = jnp.where(diff == 0, 1, jnp.where(diff == 1, 2, 4))
                bits_acc = bits_acc + jnp.where(m, bitv, 0)
                idx = lo_b + r * 128 + lane
                pos_acc = jnp.minimum(pos_acc, jnp.where(m, idx, _BIG))

            bits = jnp.sum(bits_acc, axis=1)               # (T,)
            r0 = jnp.min(pos_acc, axis=1)                  # (T,)
            b0 = jax.lax.bitwise_and(bits, 1)
            b1 = jax.lax.bitwise_and(jax.lax.shift_right_logical(bits, 1), 1)
            b2 = jax.lax.bitwise_and(jax.lax.shift_right_logical(bits, 2), 1)
            d1 = b0                                         # rank of dz=0 run
            d2 = b0 + b1
            field = (b0 * 1
                     + b1 * jax.lax.shift_left(d1 + 1, 2)
                     + b2 * jax.lax.shift_left(d2 + 1, 4))
            rd = jnp.where(bits > 0, r0 * 64 + field, -1)
            out_ref[b, :] = rd


@functools.partial(jax.jit,
                   static_argnames=("tile", "window", "spatial_shape",
                                    "capacity"))
def build_spans_banded(keys: jnp.ndarray, *, spatial_shape: tuple,
                       capacity: int, tile: int, window: int) -> BandSpans:
    """BandSpans (lo, rd, ok) of the 27-point submanifold rulebook over
    sorted ``keys`` (V,) int32 (SENTINEL padded), without building the rule.

    Exact-equivalence contract: ``rd``/``lo`` match
    ``rule_spans(build_subm_rulebook(grid, 3, table), tile, window, V)`` up
    to window placement (any lo satisfying the coverage invariant is valid —
    the conv kernel only uses lo as a base pointer), and ``ok`` implies every
    candidate is in-window (tests/test_pallas_rd.py asserts both).
    """
    v = keys.shape[0]
    assert v % tile == 0 and v % 128 == 0 and window % 128 == 0
    sx, sy, sz = (int(s) for s in spatial_shape)
    ntiles = v // tile
    deltas = band_deltas((sx, sy, sz))

    # --- XLA prep: per-(band, tile) window bounds from boundary keys -------
    tk = keys.reshape(ntiles, tile)
    live_row = tk != SENTINEL
    # int32 throughout: key + band delta < 2^31 by the model's key-space
    # assert (network.py apply); only dead tiles (kmin == SENTINEL) can wrap,
    # and those are masked out of ok and skipped by the kernel
    kmin = jnp.min(jnp.where(live_row, tk, np.iinfo(np.int32).max), axis=1)
    kmax = jnp.max(jnp.where(live_row, tk, np.iinfo(np.int32).min), axis=1)
    live_tile = kmin != np.iinfo(np.int32).max
    dlt = jnp.asarray([d for _, _, d in deltas], jnp.int32)[:, None]
    # method='sort' (concat + one sort) measured ~2x faster than the default
    # binary-search lowering for these shapes on v5e
    lo_raw = jnp.searchsorted(keys, kmin[None, :] + dlt - 1,
                              side="left", method="sort").astype(jnp.int32)
    hi_raw = jnp.searchsorted(keys, kmax[None, :] + dlt + 1,
                              side="right", method="sort").astype(jnp.int32)
    lo = (lo_raw // _ALIGN) * _ALIGN
    lo = jnp.clip(lo, 0, max(v - window, 0))
    span_ok = (hi_raw - lo) <= (window - 8)
    ok = jnp.all(span_ok | ~live_tile[None, :])

    n_live = jnp.sum((keys != SENTINEL).astype(jnp.int32)).reshape(1)

    # query-side validity guard word per voxel (see _rd_kernel): bits 0-8 =
    # (x+dx, y+dy) in range per band, bit 9 = z > 0, bit 10 = z < sz-1
    z = jax.lax.rem(keys, sz)
    rest = jax.lax.div(keys, sz)
    y = jax.lax.rem(rest, sy)
    x = jax.lax.rem(jax.lax.div(rest, sy), sx)
    valid = keys != SENTINEL
    guard = jnp.zeros((v,), jnp.int32)
    for b, (dx, dy, _) in enumerate(deltas):
        okb = (valid & (x + dx >= 0) & (x + dx < sx)
               & (y + dy >= 0) & (y + dy < sy))
        guard = guard | (okb.astype(jnp.int32) << b)
    guard = guard | ((valid & (z > 0)).astype(jnp.int32) << 9)
    guard = guard | ((valid & (z < sz - 1)).astype(jnp.int32) << 10)

    from .pallas_conv import _lo_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            # per-tile SMEM lo rows (see pallas_conv._lo_rows): replaces the
            # scalar-prefetched (9, ntiles) table whose SMEM residency capped
            # capacity at 2^22 voxels
            pl.BlockSpec((8, 16), lambda t, nl: (t // 8, 0),
                         memory_space=pltpu.SMEM),
            # 3-D (ntiles, 1, tile) views: Mosaic requires the block's
            # last-two dims be (8k, 128k) or equal to the array dims — a
            # (1, tile) block on a (ntiles, tile) array fails the sublane rule
            pl.BlockSpec((1, 1, tile), lambda t, nl: (t, 0, 0)),  # keys
            pl.BlockSpec((1, 1, tile), lambda t, nl: (t, 0, 0)),  # guard
            pl.BlockSpec(memory_space=pltpu.HBM),                # key rows
        ],
        out_specs=pl.BlockSpec((9, tile), lambda t, nl: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((2, window // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    rd = pl.pallas_call(
        functools.partial(_rd_kernel, window=window, tile=tile,
                          deltas=deltas),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((9, v), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(n_live, _lo_rows(lo), keys.reshape(ntiles, 1, tile),
      guard.reshape(ntiles, 1, tile), keys.reshape(v // 128, 128))
    return BandSpans(lo=lo, rd=rd, ok=ok)


def rd_nnz(rd: jnp.ndarray) -> jnp.ndarray:
    """Number of valid (offset, voxel) pairs encoded in an rd array — equals
    ``jnp.sum(rule >= 0)`` of the equivalent (27, V) rule."""
    live = rd >= 0
    f0 = jax.lax.bitwise_and(rd, 3) != 0
    f1 = jax.lax.bitwise_and(jax.lax.shift_right_logical(rd, 2), 3) != 0
    f2 = jax.lax.bitwise_and(jax.lax.shift_right_logical(rd, 4), 3) != 0
    cnt = (f0.astype(jnp.int32) + f1.astype(jnp.int32) + f2.astype(jnp.int32))
    return jnp.sum(jnp.where(live, cnt, 0), dtype=jnp.int32)
