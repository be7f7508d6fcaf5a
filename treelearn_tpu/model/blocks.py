"""Functional model blocks: BatchNorm, MLP, ResidualBlock, UBlock.

Parity targets (reference: tree_learn/model/blocks.py):
* ``MLP`` — Linear(C,C) + BN + ReLU + Linear(C,out)   (blocks.py:8-26)
* ``Custom1x1Subm3d`` — 1x1 sparse conv as plain matmul (blocks.py:29-39)
* ``ResidualBlock`` — pre-activation BN-ReLU-SubMConv x2 + identity/1x1
  shortcut (blocks.py:42-79)
* ``UBlock`` — recursive U-Net level (blocks.py:81-149)

Everything is a pure function over explicit pytrees.  Parameter trees are
nested dicts whose key paths mirror the reference's torch ``state_dict`` names
(e.g. ``unet.blocks.block0.conv_branch.2.weight``) so checkpoint import is a
mechanical relayout.  BatchNorm running statistics live in a parallel ``state``
tree with the same key paths.

Sparse convs consume the per-level rulebooks from ops/sparse.py; all subm convs
of a level share one rulebook (spconv ``indice_key='subm{i}'`` parity) and the
down/inverse pair shares one DownsampleRulebook (``indice_key='spconv{i}'``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import (
    DownsampleRulebook,
    SparseGrid,
    build_downsample,
    build_subm_rulebook,
    down_conv,
    inverse_conv,
    subm_conv,
)


def _subm(x, weight, rule, live, fast, spans=None, tile_window=None,
          rule_thunk=None):
    """Submanifold conv dispatch: differentiable Pallas banded kernel
    (ops/pallas_conv.py) when ``fast`` is truthy, XLA gather path otherwise.
    ``fast="zeros"`` uses the zeros+host-retry out-of-window fallback (see
    rule_conv_fast) instead of embedding the XLA branch; with ``fast=True``
    and ``rule=None`` the fallback rule is built lazily INSIDE the cond
    branch by ``rule_thunk`` (only overflowing batches pay the 27-probe
    build).  A submanifold rule is its own transpose under kernel-offset
    mirroring.  ``spans`` is the level-shared (lo, ok) precompute;
    ``tile_window`` the level's (tile, window) choice."""
    if fast:
        from ..ops.pallas_conv import rule_conv_ad

        fb = "zeros" if fast == "zeros" else "xla"
        return rule_conv_ad(x, weight, rule, rule, live, live,
                            spans, spans, True, True, tile_window, fb,
                            rule_thunk)
    if rule is None:
        rule = rule_thunk()
    return subm_conv(x, weight.astype(x.dtype), rule, live)


# NOTE on the down/inverse convs: they use the native scatter/gather
# formulation (ops/sparse.py down_conv/inverse_conv — one wide MXU GEMM +
# corner select + segment scatter/gather, autodiff-native) on every backend.
# A banded-window formulation was tried and reverted: the child indices of a
# sorted parent tile span ~2x the tile PLUS a full child row per y-parity
# boundary (measured 2855 rows for a 128-parent tile on a dense 35 m tile),
# so no practical static window covers them — dense tiles silently fell back
# on every step.  The scatter form moves the same bytes once, with no
# window fragility.

BN_EPS = 1e-4       # reference tree_learn.py:34
BN_MOMENTUM = 0.1   # reference tree_learn.py:34


# ---------------------------------------------------------------------------
# Parameter initializers
# ---------------------------------------------------------------------------

def init_bn(channels: int):
    params = {
        "weight": np.ones((channels,), np.float32),
        "bias": np.zeros((channels,), np.float32),
    }
    state = {
        "running_mean": np.zeros((channels,), np.float32),
        "running_var": np.ones((channels,), np.float32),
    }
    return params, state


# Initialization runs entirely in numpy: "keys" are np.random.SeedSequence
# objects (split = .spawn, fold_in = spawn_key extension).  jax.random would
# compile one tiny XLA program per distinct shape — ~100 compiles for the
# depth-7 U-Net, minutes on a slow host — for numbers that are about to be
# overwritten by training or a checkpoint anyway.

def _split(key, num=2):
    return key.spawn(num)


def _fold_in(key, i: int):
    return np.random.SeedSequence(entropy=key.entropy,
                                  spawn_key=key.spawn_key + (int(i),))


def _kaiming_uniform(key, shape, fan_in):
    # torch's default conv/linear init: kaiming uniform with a=sqrt(5)
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in)) * math.sqrt(2.0)
    rng = np.random.default_rng(key)
    return rng.uniform(-bound, bound, shape).astype(np.float32)


def init_subm_conv(key, kernel_size: int, c_in: int, c_out: int):
    k = kernel_size ** 3
    fan_in = c_in * k
    return {"weight": _kaiming_uniform(key, (k, c_in, c_out), fan_in)}


def init_down_conv(key, c_in: int, c_out: int):
    return {"weight": _kaiming_uniform(key, (8, c_in, c_out), c_in * 8)}


def init_linear(key, c_in: int, c_out: int, xavier: bool = False, normal_std: Optional[float] = None):
    kw, kb = _split(key)
    if normal_std is not None:
        w = (np.random.default_rng(kw).normal(size=(c_out, c_in))
             * normal_std).astype(np.float32)
        b = np.zeros((c_out,), np.float32)
    elif xavier:
        bound = math.sqrt(6.0 / (c_in + c_out))
        w = np.random.default_rng(kw).uniform(
            -bound, bound, (c_out, c_in)).astype(np.float32)
        b = np.zeros((c_out,), np.float32)
    else:
        w = _kaiming_uniform(kw, (c_out, c_in), c_in)
        bound = 1.0 / math.sqrt(c_in)
        b = np.random.default_rng(kb).uniform(
            -bound, bound, (c_out,)).astype(np.float32)
    return {"weight": w, "bias": b}


# ---------------------------------------------------------------------------
# Primitive applies
# ---------------------------------------------------------------------------

def apply_bn(params, state, x, live, *, training: bool, frozen: bool = False):
    """BatchNorm1d over live rows (padding rows excluded from batch stats).

    Matches torch semantics: normalize with biased batch variance during
    training, update running_var with the unbiased estimate; eval mode uses
    running stats.  ``frozen`` forces eval-mode stats (fixed_modules parity,
    reference tree_learn.py:66-72).
    """
    w = params["weight"].astype(x.dtype)
    b = params["bias"].astype(x.dtype)
    if training and not frozen:
        livef = live.astype(jnp.float32)[:, None]
        cnt = jnp.maximum(livef.sum(), 1.0)
        xf = x.astype(jnp.float32)
        mean = (xf * livef).sum(0) / cnt
        var = (jnp.square(xf - mean) * livef).sum(0) / cnt
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        new_state = {
            "running_mean": (1 - BN_MOMENTUM) * state["running_mean"] + BN_MOMENTUM * mean,
            "running_var": (1 - BN_MOMENTUM) * state["running_var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean = state["running_mean"]
        var = state["running_var"]
        new_state = state
    inv = jax.lax.rsqrt(var + BN_EPS).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * inv * w + b
    return y, new_state


def apply_linear(params, x):
    return x @ params["weight"].T.astype(x.dtype) + params["bias"].astype(x.dtype)


def apply_mlp(params, state, x, live, *, training: bool, frozen: bool = False):
    """MLP parity (blocks.py:8-18): Linear -> BN -> ReLU -> Linear.

    Torch Sequential indices: 0 = Linear, 1 = BN, 3 = final Linear.
    """
    y = apply_linear(params["0"], x)
    y, bn_state = apply_bn(params["1"], state["1"], y, live, training=training, frozen=frozen)
    y = jax.nn.relu(y)
    y = apply_linear(params["3"], y)
    return y, {"1": bn_state}


def init_mlp(key, c_in: int, c_out: int):
    """Weight init parity (blocks.py:20-26): xavier on hidden, N(0, 0.01) on out."""
    k0, k1 = _split(key)
    bn_p, bn_s = init_bn(c_in)
    params = {
        "0": init_linear(k0, c_in, c_in, xavier=True),
        "1": bn_p,
        "3": init_linear(k1, c_in, c_out, normal_std=0.01),
    }
    return params, {"1": bn_s}


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------

def init_residual_block(key, c_in: int, c_out: int, kernel_size: int):
    k0, k1, k2 = _split(key, 3)
    bn0_p, bn0_s = init_bn(c_in)
    bn3_p, bn3_s = init_bn(c_out)
    params = {
        "conv_branch": {
            "0": bn0_p,
            "2": init_subm_conv(k0, kernel_size, c_in, c_out),
            "3": bn3_p,
            "5": init_subm_conv(k1, kernel_size, c_out, c_out),
        }
    }
    state = {"conv_branch": {"0": bn0_s, "3": bn3_s}}
    if c_in != c_out:
        # Custom1x1Subm3d stores weight as (c_out, 1, 1, 1, c_in) in torch; we
        # keep the collapsed (c_out, c_in) matmul form (blocks.py:29-39).
        params["i_branch"] = {"0": {"weight": _kaiming_uniform(k2, (c_out, c_in), c_in)}}
    return params, state


def apply_residual_block(params, state, x, rule, live, *, training: bool,
                         frozen: bool = False, fast: bool = False,
                         spans=None, tile_window=None, rule_thunk=None):
    """Pre-activation residual block (blocks.py:42-79)."""
    cb, cs = params["conv_branch"], state["conv_branch"]
    y, s0 = apply_bn(cb["0"], cs["0"], x, live, training=training, frozen=frozen)
    y = jax.nn.relu(y)
    y = _subm(y, cb["2"]["weight"], rule, live, fast, spans, tile_window,
              rule_thunk)
    y, s3 = apply_bn(cb["3"], cs["3"], y, live, training=training, frozen=frozen)
    y = jax.nn.relu(y)
    y = _subm(y, cb["5"]["weight"], rule, live, fast, spans, tile_window,
              rule_thunk)

    if "i_branch" in params:
        shortcut = x @ params["i_branch"]["0"]["weight"].T.astype(x.dtype)
    else:
        shortcut = x
    out = y + shortcut
    out = jnp.where(live[:, None], out, 0.0)
    return out, {"conv_branch": {"0": s0, "3": s3}}


def apply_block_chain(blocks_p, blocks_s, block_names, x, rule, live, *,
                      training: bool, frozen: bool = False, fast: bool = False,
                      spans=None, tile_window=None, rule_thunk=None):
    """A chain of IDENTITY residual blocks (c->c, no i_branch) as one
    lax.scan over the 2*len(block_names) (BN, ReLU, conv) steps.

    Semantics identical to applying :func:`apply_residual_block` in sequence;
    the scan exists purely for executable size: each unrolled conv instance
    costs ~2-3 MB of TPU code and the depth-7 U-Net has 56 of them — unrolled
    they produced a >700 MB executable whose upload to the device dominated
    end-to-end latency (~2 MB/s on a tunneled chip).
    """
    bn_w, bn_b, bn_m, bn_v, w, ends = [], [], [], [], [], []
    for name in block_names:
        cb, cs = blocks_p[name]["conv_branch"], blocks_s[name]["conv_branch"]
        assert "i_branch" not in blocks_p[name], "chain requires identity blocks"
        for bn_key, conv_key, end in (("0", "2", 0.0), ("3", "5", 1.0)):
            bn_w.append(cb[bn_key]["weight"])
            bn_b.append(cb[bn_key]["bias"])
            bn_m.append(cs[bn_key]["running_mean"])
            bn_v.append(cs[bn_key]["running_var"])
            w.append(cb[conv_key]["weight"])
            ends.append(end)
    xs = (jnp.stack([jnp.asarray(a) for a in bn_w]),
          jnp.stack([jnp.asarray(a) for a in bn_b]),
          jnp.stack([jnp.asarray(a) for a in bn_m]),
          jnp.stack([jnp.asarray(a) for a in bn_v]),
          jnp.stack([jnp.asarray(a) for a in w]),
          jnp.asarray(np.array(ends, np.float32)))

    def body(carry, step):
        x, skip = carry
        sw, sb, sm, sv, wk, end = step
        y, bn_new = apply_bn({"weight": sw, "bias": sb},
                             {"running_mean": sm, "running_var": sv},
                             x, live, training=training, frozen=frozen)
        y = jax.nn.relu(y)
        y = _subm(y, wk, rule, live, fast, spans, tile_window,
                  rule_thunk)
        is_end = end > 0.5
        out = jnp.where(is_end, y + skip, y)
        out = jnp.where(live[:, None], out, 0.0)
        new_skip = jnp.where(is_end, out, skip)
        return (out, new_skip), (bn_new["running_mean"], bn_new["running_var"])

    (x, _), (rm, rv) = jax.lax.scan(body, (x, x), xs)

    new_state = {}
    s = 0
    for name in block_names:
        new_state[name] = {"conv_branch": {
            "0": {"running_mean": rm[s], "running_var": rv[s]},
            "3": {"running_mean": rm[s + 1], "running_var": rv[s + 1]},
        }}
        s += 2
    return x, new_state


# ---------------------------------------------------------------------------
# UBlock (recursive U-Net level)
# ---------------------------------------------------------------------------

class LevelPlan(NamedTuple):
    """Precomputed sparse topology of one U-Net level (shared by all its
    blocks — the spconv indice_key cache made explicit).  The ``*_spans``
    fields are the banded-window (lo, ok) precomputes shared by every conv
    using the corresponding rule (ops/pallas_conv.py:rule_spans); None when
    the shapes do not admit the banded path."""

    grid: SparseGrid
    subm_rule: jnp.ndarray                  # (K, V) gather table
    down: Optional[DownsampleRulebook]      # None at the deepest level
    down_rule: Optional[jnp.ndarray]        # (8, V_out) gather-form strided rule
    inv_rule: Optional[jnp.ndarray]         # (8, V_in) gather-form inverse rule
    subm_spans: Optional[tuple] = None
    down_spans: Optional[tuple] = None
    inv_spans: Optional[tuple] = None
    tile_window: Optional[tuple] = None     # level's (tile, window) in voxels


def level_tile_window(channels: int, capacity: int = 1 << 19):
    """Per-level (tile, window) in voxels for the sliding-pair banded kernel
    (ops/pallas_conv.py).  The gather GEMM costs ~window/2 rows per output
    voxel, so the window is the minimal 3x tile (ratio 2 overflowed on
    centered plots; overflows still fall back exactly via the spans-ok
    flag), floored at 512 and 128-aligned for the rd builder.  Tile floors
    at 128 (Mosaic requires 128-divisible lane blocks for the (9, tile) rd
    tiles); C<=32 uses tile 256 (measured faster than 128/512 at the hot L0
    shape).  Tile no longer grows with capacity: the window-start table
    streams as per-tile (8, 16) SMEM blocks (ops/pallas_conv.py:_lo_rows)
    instead of being scalar-prefetched whole, so SMEM no longer bounds the
    tile count — selection work per output voxel stays constant at every
    whole-plot capacity (previously it grew 4x at 2^23)."""
    tile = 256 if channels <= 32 else 128
    window = max(3 * tile, 512)
    window = ((window + 127) // 128) * 128
    return tile, window


def build_level_plans(grid: SparseGrid, num_levels: int, kernel_size: int,
                      capacities: Sequence[int],
                      static_spatial_shape: Optional[Sequence[int]] = None,
                      batch_size: int = 1,
                      rule_free: bool = False,
                      level_windows: Optional[Sequence[int]] = None
                      ) -> Tuple[LevelPlan, ...]:
    """Build all rulebooks for a tile once (reference builds them lazily inside
    spconv and caches by indice_key; we do it up front, still one-time work).

    ``rule_free`` (the fast_conv="zeros" program): levels whose shapes admit
    the banded kernels get their BandSpans straight from the sorted keys via
    the Pallas rd kernel (ops/pallas_rd.py) and carry ``subm_rule=None`` —
    the (27, V) rule and its 27 dense-table probes (~220 ms at 512k voxels on
    v5e) are never materialized.  Requires kernel_size == 3 and a static
    spatial shape; other levels fall back to the table-probe build.

    With a static spatial shape, neighbor probes use per-level dense
    direct-address tables (ops/sparse.py:build_dense_table) — one scatter per
    level, O(1) probes; otherwise binary search over sorted keys.
    """
    from ..ops.sparse import build_dense_table
    from ..ops.pallas_conv import rule_spans

    def spans_for(rule, v_in, tile, window):
        if rule.shape[1] % tile != 0 or v_in < window:
            return None  # rule_conv_fast uses the XLA path for these shapes
        return rule_spans(rule, tile, window, v_in)

    plans = []
    g = grid
    shape = tuple(static_spatial_shape) if static_spatial_shape is not None else None
    for lvl in range(num_levels):
        cap = int(g.capacity)
        tile, window = level_tile_window(32 * (lvl + 1), cap)
        if level_windows is not None and level_windows[lvl]:
            # measured per-level window (whole-plot mode: the host mirrors
            # the level key sets and sizes each window to the true max band
            # span — ops/voxelize.py:level_span_windows_np) instead of the
            # fixed 3x-tile heuristic
            window = int(level_windows[lvl])
        banded_ok = (cap % tile == 0 and cap >= window and cap % 128 == 0)
        if rule_free and shape is not None and kernel_size == 3 and banded_ok:
            from ..ops.pallas_rd import build_spans_banded

            rule = None
            spans = build_spans_banded(
                g.keys, spatial_shape=shape, capacity=cap,
                tile=tile, window=window)
        else:
            table = None
            if shape is not None:
                table_size = batch_size * shape[0] * shape[1] * shape[2]
                table = build_dense_table(g, table_size)
            rule = build_subm_rulebook(g, kernel_size, dense_table=table)
            spans = spans_for(rule, cap, tile, window)
        if lvl < num_levels - 1:
            out_table = None
            if shape is not None:
                half = tuple(s2 // 2 for s2 in shape)
                out_table = batch_size * half[0] * half[1] * half[2]
            rb = build_downsample(g, int(capacities[lvl + 1]),
                                  out_table_size=out_table)
            plans.append(LevelPlan(
                grid=g, subm_rule=rule, down=rb,
                down_rule=None, inv_rule=None, subm_spans=spans,
                tile_window=(tile, window)))
            g = rb.out_grid
            if shape is not None:
                shape = tuple(s // 2 for s in shape)
        else:
            plans.append(LevelPlan(grid=g, subm_rule=rule, down=None,
                                   down_rule=None, inv_rule=None,
                                   subm_spans=spans,
                                   tile_window=(tile, window)))
    return tuple(plans)


def init_ublock(key, n_planes: Sequence[int], block_reps: int, kernel_size: int):
    keys = _split(key, 6)
    params, state = {}, {}

    blocks_p, blocks_s = {}, {}
    for i in range(block_reps):
        bp, bs = init_residual_block(
            _fold_in(keys[0], i), n_planes[0], n_planes[0], kernel_size)
        blocks_p[f"block{i}"] = bp
        blocks_s[f"block{i}"] = bs
    params["blocks"], state["blocks"] = blocks_p, blocks_s

    if len(n_planes) > 1:
        bn_p, bn_s = init_bn(n_planes[0])
        params["conv"] = {"0": bn_p, "2": init_down_conv(keys[1], n_planes[0], n_planes[1])}
        state["conv"] = {"0": bn_s}

        up, us = init_ublock(keys[2], n_planes[1:], block_reps, kernel_size)
        params["u"], state["u"] = up, us

        bn2_p, bn2_s = init_bn(n_planes[1])
        params["deconv"] = {"0": bn2_p, "2": init_down_conv(keys[3], n_planes[1], n_planes[0])}
        state["deconv"] = {"0": bn2_s}

        tail_p, tail_s = {}, {}
        for i in range(block_reps):
            bp, bs = init_residual_block(
                _fold_in(keys[4], i),
                n_planes[0] * (2 - i), n_planes[0], kernel_size)
            tail_p[f"block{i}"] = bp
            tail_s[f"block{i}"] = bs
        params["blocks_tail"], state["blocks_tail"] = tail_p, tail_s
    return params, state


def apply_ublock(params, state, x, plans: Tuple[LevelPlan, ...], level: int,
                 *, block_reps: int, training: bool, frozen: bool = False,
                 fast: bool = False):
    """Recursive UBlock forward (blocks.py:137-149)."""
    plan = plans[level]
    live = plan.grid.live_mask
    new_state = {}
    # lazy fallback rule: only built if an overflow actually takes the
    # lax.cond slow branch (plan.subm_rule is None on the rule-free path)
    rule_thunk = (None if plan.subm_rule is not None
                  else (lambda g=plan.grid: build_subm_rulebook(g, 3)))

    # head blocks are identity residual blocks (c -> c): one scanned chain
    x, s = apply_block_chain(
        params["blocks"], state["blocks"],
        [f"block{i}" for i in range(block_reps)],
        x, plan.subm_rule, live, training=training, frozen=frozen, fast=fast,
        spans=plan.subm_spans, tile_window=plan.tile_window,
        rule_thunk=rule_thunk)
    new_state["blocks"] = s

    if "u" in params:
        identity = x
        y, s = apply_bn(params["conv"]["0"], state["conv"]["0"], x, live,
                        training=training, frozen=frozen)
        new_state["conv"] = {"0": s}
        y = jax.nn.relu(y)
        y = down_conv(y, params["conv"]["2"]["weight"], plan.down)

        y, s = apply_ublock(params["u"], state["u"], y, plans, level + 1,
                            block_reps=block_reps, training=training,
                            frozen=frozen, fast=fast)
        new_state["u"] = s

        coarse_live = plan.down.out_grid.live_mask
        y, s = apply_bn(params["deconv"]["0"], state["deconv"]["0"], y, coarse_live,
                        training=training, frozen=frozen)
        new_state["deconv"] = {"0": s}
        y = jax.nn.relu(y)
        y = inverse_conv(y, params["deconv"]["2"]["weight"], plan.down, live)

        x = jnp.concatenate([identity, y], axis=1)
        new_state["blocks_tail"] = {}
        # tail block0 takes the 2c skip-concat input (i_branch projection) —
        # not chainable; the remaining tail blocks are identity c -> c
        x, s = apply_residual_block(
            params["blocks_tail"]["block0"], state["blocks_tail"]["block0"],
            x, plan.subm_rule, live, training=training, frozen=frozen,
            fast=fast, spans=plan.subm_spans, tile_window=plan.tile_window,
            rule_thunk=rule_thunk)
        new_state["blocks_tail"]["block0"] = s
        if block_reps > 1:
            x, s = apply_block_chain(
                params["blocks_tail"], state["blocks_tail"],
                [f"block{i}" for i in range(1, block_reps)],
                x, plan.subm_rule, live, training=training, frozen=frozen,
                fast=fast, spans=plan.subm_spans,
                tile_window=plan.tile_window, rule_thunk=rule_thunk)
            new_state["blocks_tail"].update(s)
    return x, new_state
