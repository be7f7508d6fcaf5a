"""Pallas TPU kernels for the sparse convolutions: banded gather-GEMM.

Why: XLA's row gather on TPU runs at a few GB/s (measured 4.5 GB/s for
(1M, 32)-bf16 rows on v5e), making gathers ~95% of submanifold conv time.
But our rulebooks have structure XLA cannot see: voxel keys are *sorted*, and
a fixed kernel offset shifts every key by the same delta, so each rulebook
column ``rule[k]`` is monotonically non-decreasing over live rows.  Hence for
an output tile of T consecutive voxels, all its inputs for offset k lie in a
*contiguous* window of the feature array.

The kernel therefore never gathers from HBM: per (tile, offset) it DMAs the
contiguous window (full-bandwidth sequential read) into VMEM and selects rows
with a one-hot matrix multiplied on the MXU:

    G[t, r] = (rule[k, tile_t] - lo == r)          # (T, R) one-hot, built on VPU
    out_tile += (G @ window) @ W[k]                # two MXU GEMMs

Window residency is double-buffered across offsets.  Entries whose input
falls outside the window (possible only in pathological density jumps) are
counted on the host side by :func:`banded_spans_ok`; callers fall back to the
XLA path via ``lax.cond`` when any would be dropped, so results are always
exact.  Reference semantics: spconv SubMConv3d (reference blocks.py:57).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (tile, window) = (128, 512): selection-GEMM FLOPs scale with window alone
# (T cancels), while within-tile index spread scales with tile — T=256 tiles
# overflowed 512-windows on centered plots (L0/L1 spread > 256), silently
# routing the HOT submanifold convs to the fallback.  T=128 doubles window
# DMA traffic but keeps every level on the banded path.
DEFAULT_TILE = 128
DEFAULT_WINDOW = 512
# strided/inverse rules map between levels whose sizes differ 2x, so a tile
# of T outputs gathers from ~2T inputs plus full-row skips at y-parity
# boundaries — their windows must be much wider than the submanifold ones
# (measured: (128, 2048) covers every level of the bench plot; (256, 512)
# NEVER covered the down rules, silently routing them to the fallback)
DOWN_TILE = 128
DOWN_WINDOW = 2048
_ALIGN = 16  # bf16 sublane tile: DMA slice starts must be provably aligned

# interpreter mode for CPU-side testing of the kernels
_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"


def _tile_lo(rule: jnp.ndarray, tile: int, window: int, v: int) -> jnp.ndarray:
    """(K, ntiles) int32 window starts: min valid input index per (k, tile),
    aligned down to the sublane tile so Mosaic can slice at full speed.
    Layout (K, ntiles) keeps the SMEM prefetch small (last dim is padded)."""
    k, n = rule.shape
    ntiles = n // tile
    r = rule.reshape(k, ntiles, tile)
    big = jnp.int32(2**30)
    lo = jnp.min(jnp.where(r >= 0, r, big), axis=2)
    lo = jnp.where(lo == big, 0, lo)
    lo = (lo // _ALIGN) * _ALIGN
    return jnp.clip(lo, 0, max(v - window, 0)).astype(jnp.int32)


def rule_spans(rule: jnp.ndarray, tile: int, window: int, v: int):
    """Precompute the banded-window metadata of a rulebook: ``(lo, ok)`` where
    ``lo`` is the (K, ntiles) int32 window starts and ``ok`` is a () bool that
    is True iff every valid rulebook entry falls inside its tile's window
    (i.e. the fast Pallas path is exact for this rulebook).

    All convs sharing a rulebook (all blocks of a U-Net level — the spconv
    ``indice_key`` group) share one spans computation; compute it once per
    level and pass it to :func:`rule_conv_fast` / :func:`rule_conv_ad`."""
    k, n = rule.shape
    ntiles = n // tile
    lo = _tile_lo(rule, tile, window, v)  # (K, ntiles)
    r = rule.reshape(k, ntiles, tile)
    rel = r - lo[:, :, None]
    bad = (r >= 0) & ((rel < 0) | (rel >= window))
    return lo, ~jnp.any(bad)


def banded_spans_ok(rule: jnp.ndarray, tile: int, window: int, v: int):
    """() bool — see :func:`rule_spans`."""
    return rule_spans(rule, tile, window, v)[1]


def _subm_kernel(lo_ref, n_live_ref, rule_ref, feats_hbm, w_ref, out_ref,
                 window_buf, acc_ref, sems, *, n_offsets, window, tile,
                 out_dtype):
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    # capacity padding: tiles entirely past the live rows do no work
    @pl.when(t * tile < n_live_ref[0])
    def _():
        def dma(k_idx, slot):
            start = pl.multiple_of(lo_ref[k_idx, t], _ALIGN)
            return pltpu.make_async_copy(
                feats_hbm.at[pl.ds(start, window), :],
                window_buf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)

        # fori_loop (NOT a python loop): the unrolled body costs ~0.5 MB of
        # VLIW code per offset and the model instantiates ~65 of these kernels
        # — unrolling K=27 produced a 741 MB executable whose upload to the
        # device dominated end-to-end time.  Double-buffering works unchanged:
        # iteration k waits on slot k%2 while k+1 streams into the other slot.
        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_offsets)
            def _():
                dma(k + 1, jax.lax.rem(k + 1, 2)).start()

            dma(k, slot).wait()

            rule_k = rule_ref[k, :]                          # (T,)
            rel = rule_k - lo_ref[k, t]
            valid = (rule_k >= 0) & (rel >= 0) & (rel < window)
            rel = jnp.where(valid, rel, -1)
            one_hot = (rel[:, None] == col_ids).astype(jnp.bfloat16)  # (T, R)

            h = jnp.dot(one_hot, window_buf[slot],
                        preferred_element_type=jnp.float32)  # selected rows
            acc_ref[:] += jnp.dot(h.astype(jnp.bfloat16), w_ref[k],
                                  preferred_element_type=jnp.float32)
            return _

        jax.lax.fori_loop(0, n_offsets, body, None, unroll=False)
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def subm_conv_banded(feats: jnp.ndarray, weight: jnp.ndarray,
                     rule: jnp.ndarray, live_mask: jnp.ndarray,
                     tile: int = DEFAULT_TILE,
                     window: int = DEFAULT_WINDOW,
                     lo: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Banded-window Pallas submanifold conv (unchecked fast path).

    feats (V, Cin) any float dtype; weight (K, Cin, Cout); rule (K, V).
    V must be a multiple of ``tile`` and >= ``window``.  ``lo`` is the
    precomputed window-start table from :func:`rule_spans` (recomputed here
    when absent).
    """
    v, cin = feats.shape          # input rows (gather source)
    v_out = rule.shape[1]         # output rows
    k, _, cout = weight.shape
    assert v_out % tile == 0 and v >= window, (v, v_out, tile, window)
    ntiles = v_out // tile

    if lo is None:
        lo = _tile_lo(rule, tile, window, v)
    # Mosaic requires DMA slices lane-aligned to 128: pad channels (weights are
    # zero-padded so no in-kernel slicing is needed; the extra MXU columns are
    # free relative to the DMA win).
    cpad = ((cin + 127) // 128) * 128
    feats_b = feats.astype(jnp.bfloat16)
    if cpad != cin:
        feats_b = jnp.pad(feats_b, ((0, 0), (0, cpad - cin)))
    weight_b = weight.astype(jnp.bfloat16)
    if cpad != cin:
        weight_b = jnp.pad(weight_b, ((0, 0), (0, cpad - cin), (0, 0)))

    n_live = jnp.sum(live_mask).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, lo, nl: (0, t)),   # rule tile
            pl.BlockSpec(memory_space=pltpu.HBM),                # feats stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, lo, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cpad), jnp.bfloat16),
            pltpu.VMEM((tile, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_subm_kernel, n_offsets=k, window=window, tile=tile,
                          out_dtype=feats.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(lo, n_live, rule, feats_b, weight_b)
    return jnp.where(live_mask[:, None], out, 0)


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dW[k] = sum_i x[rule[k, i]] g[i]^T
# ---------------------------------------------------------------------------

def _dw_kernel(lo_ref, n_live_ref, rule_ref, g_ref, x_hbm, out_ref,
               window_buf, sems, *, n_offsets, window, tile):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * tile < n_live_ref[0])
    def _():
        def dma(k_idx, slot):
            start = pl.multiple_of(lo_ref[k_idx, t], _ALIGN)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, window), :],
                window_buf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
        g_tile = g_ref[:]  # (T, Cout) bf16

        # fori_loop over offsets for code size (see _subm_kernel)
        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_offsets)
            def _():
                dma(k + 1, jax.lax.rem(k + 1, 2)).start()

            dma(k, slot).wait()

            rule_k = rule_ref[k, :]
            rel = rule_k - lo_ref[k, t]
            valid = (rule_k >= 0) & (rel >= 0) & (rel < window)
            rel = jnp.where(valid, rel, -1)
            one_hot = (rel[:, None] == col_ids).astype(jnp.bfloat16)

            gathered = jnp.dot(one_hot, window_buf[slot],
                               preferred_element_type=jnp.float32)  # (T, Cpad)
            out_ref[k] += jnp.dot(gathered.astype(jnp.bfloat16).T, g_tile,
                                  preferred_element_type=jnp.float32)
            return _

        jax.lax.fori_loop(0, n_offsets, body, None, unroll=False)


@functools.partial(jax.jit, static_argnames=("tile", "window"))
def rule_conv_dw_banded(x: jnp.ndarray, g: jnp.ndarray, rule: jnp.ndarray,
                        live_mask: jnp.ndarray, tile: int = DEFAULT_TILE,
                        window: int = DEFAULT_WINDOW,
                        lo: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weight gradient of a rulebook conv: (K, Cin, Cout) f32.

    x (V_in, Cin) inputs, g (V_out, Cout) output cotangents (must already be
    zero on dead rows).  Same banded windows as the forward; each tile adds a
    (Cin, Cout) outer-product GEMM into a VMEM-resident accumulator.
    """
    v, cin = x.shape
    v_out, cout = g.shape
    k = rule.shape[0]
    assert v_out % tile == 0 and v >= window

    if lo is None:
        lo = _tile_lo(rule, tile, window, v)
    cpad = ((cin + 127) // 128) * 128
    x_b = x.astype(jnp.bfloat16)
    if cpad != cin:
        x_b = jnp.pad(x_b, ((0, 0), (0, cpad - cin)))
    g_b = jnp.where(live_mask[:, None], g, 0).astype(jnp.bfloat16)
    n_live = jnp.sum(live_mask).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(v_out // tile,),
        in_specs=[
            pl.BlockSpec((k, tile), lambda t, lo, nl: (0, t)),   # rule tile
            pl.BlockSpec((tile, cout), lambda t, lo, nl: (t, 0)),  # g tile
            pl.BlockSpec(memory_space=pltpu.HBM),                # x windows
        ],
        out_specs=pl.BlockSpec((k, cpad, cout), lambda t, lo, nl: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, window, cpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, n_offsets=k, window=window, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, cpad, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(lo, n_live, rule, g_b, x_b)
    return dw[:, :cin, :]


def rule_conv_fast(feats: jnp.ndarray, weight: jnp.ndarray, rule: jnp.ndarray,
                   live_mask: jnp.ndarray, tile: int = DEFAULT_TILE,
                   window: int = DEFAULT_WINDOW,
                   center_identity: bool = False,
                   spans=None, fallback: str = "xla") -> jnp.ndarray:
    """Exact rulebook conv for any (K, V_out) rule — submanifold (K=27),
    gather-form strided (K=8), or inverse (K=8): Pallas banded path when every
    rulebook entry is in-window (the overwhelmingly common case on sorted
    voxel data), selected at runtime by ``lax.cond``.  ``spans`` is the
    shared (lo, ok) from :func:`rule_spans`.

    ``fallback`` picks the out-of-window branch:
    * "xla": the scan-gather conv — always exact, costs ~1.5 MB of extra
      executable per conv instance.
    * "zeros": returns zeros; the CALLER must surface the span-ok flags to
      the host (model output ``spans_ok``) and re-dispatch the batch on a
      fallback program when any is False.  This keeps the hot program free
      of ~40 never-taken branch bodies (executable upload to the tunneled
      device is the end-to-end bottleneck)."""
    from .sparse import subm_conv

    v = feats.shape[0]
    v_out = rule.shape[1]
    if v_out % tile != 0 or v < window:
        return subm_conv(feats, weight, rule, live_mask,
                         center_identity=center_identity)

    lo, ok = spans if spans is not None else rule_spans(rule, tile, window, v)
    if fallback == "zeros":
        slow = lambda f: jnp.zeros((v_out, weight.shape[2]), f.dtype)
    else:
        slow = lambda f: subm_conv(f, weight.astype(f.dtype), rule, live_mask,
                                   center_identity=center_identity)
    return jax.lax.cond(
        ok,
        lambda f: subm_conv_banded(f, weight, rule, live_mask, tile, window,
                                   lo=lo),
        slow,
        feats,
    )


def subm_conv_fast(feats, weight, rule, live_mask, tile: int = DEFAULT_TILE,
                   window: int = DEFAULT_WINDOW, spans=None):
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
# offset for submanifold convs; the down/inverse rules of the same level for
# the strided pair), so dx is the same banded kernel with transposed weights,
# and dW is one extra banded pass accumulating per-tile outer products.

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def rule_conv_ad(feats, weight, rule, rule_t, live_out, live_in,
                 spans, spans_t,
                 mirror: bool, center_identity: bool, tile_window=None,
                 fallback: str = "xla"):
    """Differentiable rulebook conv.  ``spans``/``spans_t`` are the shared
    (lo, ok) precomputes of ``rule``/``rule_t`` (see :func:`rule_spans`);
    pass None to compute them inline.  ``fallback`` as in
    :func:`rule_conv_fast`."""
    tile, window = tile_window or (DEFAULT_TILE, DEFAULT_WINDOW)
    return rule_conv_fast(feats, weight, rule, live_out, tile, window,
                          center_identity=center_identity, spans=spans,
                          fallback=fallback)


def _rule_conv_ad_fwd(feats, weight, rule, rule_t, live_out, live_in,
                      spans, spans_t, mirror, center_identity, tile_window,
                      fallback):
    out = rule_conv_ad(feats, weight, rule, rule_t, live_out, live_in,
                       spans, spans_t, mirror, center_identity, tile_window,
                       fallback)
    return out, (feats, weight, rule, rule_t, live_out, live_in, spans, spans_t)


def _rule_conv_ad_bwd(mirror, center_identity, tile_window, fallback, res, g):
    tile, window = tile_window or (DEFAULT_TILE, DEFAULT_WINDOW)
    feats, weight, rule, rule_t, live_out, live_in, spans, spans_t = res
    g = jnp.where(live_out[:, None], g, 0)

    wt = weight[::-1] if mirror else weight
    wt = wt.transpose(0, 2, 1)
    dx = rule_conv_fast(g, wt, rule_t, live_in, tile, window,
                        center_identity=center_identity, spans=spans_t,
                        fallback=fallback)
    dx = dx.astype(feats.dtype)

    v = feats.shape[0]
    v_out = rule.shape[1]
    if v_out % tile == 0 and v >= window:
        lo, ok = (spans if spans is not None
                  else rule_spans(rule, tile, window, v))
        if fallback == "zeros":
            slow = lambda a: jnp.zeros(
                (rule.shape[0], a[0].shape[1], a[1].shape[1]), jnp.float32)
        else:
            slow = lambda a: rule_conv_dw_xla(a[0], a[1], rule, live_out)
        dw = jax.lax.cond(
            ok,
            lambda a: rule_conv_dw_banded(a[0], a[1], rule, live_out, tile,
                                          window, lo=lo),
            slow,
            (feats, g),
        )
    else:
        dw = rule_conv_dw_xla(feats, g, rule, live_out)
    return (dx, dw.astype(weight.dtype), None, None, None, None, None, None)


rule_conv_ad.defvjp(_rule_conv_ad_fwd, _rule_conv_ad_bwd)
