"""The TreeLearn model: sparse U-Net backbone + semantic/offset heads.

Parity target: reference tree_learn/model/tree_learn.py.  The torch module
tree becomes a pure function over (params, state) pytrees; in-model
voxelization (PointToVoxel + nan-mean, tree_learn.py:129-167) is the fused
sort-based pooling in ops/voxelize.py; the spconv backbone is the rulebook
engine in ops/sparse.py.  One jit-compiled function runs voxelization,
rulebook construction, U-Net, and per-point heads end to end on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.voxelize import devoxelize, voxelize_points
from ..ops.sparse import grid_from_sorted_keys
from ..ops.pallas_rd import rd_nnz
from .blocks import (
    apply_bn,
    apply_mlp,
    apply_ublock,
    build_level_plans,
    init_bn,
    init_mlp,
    init_subm_conv,
    init_ublock,
)

LOSS_MULTIPLIER_SEMANTIC = 50  # reference tree_learn.py:9


def default_capacities(base_capacity: int, num_levels: int, floor: int = 512) -> Tuple[int, ...]:
    """Per-level voxel capacities: halve per downsample (conservative for
    surface-like LiDAR sparsity), floor to keep tiny levels cheap-but-valid."""
    return tuple(max(base_capacity >> i, floor) for i in range(num_levels))


class CapacityOverflow(RuntimeError):
    """A tile produced more active voxels than a level's static capacity —
    the sparse engine would silently drop voxels and mispredict.  Raise
    loudly instead (the reference's analogue is spconv's "reach zero!!!"
    crash-and-skip, util/pipeline.py:91-97; here overflow is the only
    remaining shape hazard and it is detectable exactly)."""


class SpansOverflow(RuntimeError):
    """A rulebook's banded windows could not hold every gather for the slim
    "zeros"-fallback program (fast_conv="zeros") — its output is invalid.
    Callers catch this and re-run the batch with ``fast_conv=True`` (the
    program that embeds the exact XLA fallback branch)."""


def check_capacity(output, voxel_capacity: int, num_blocks: int,
                   context: str = "",
                   level_capacities: Optional[Tuple[int, ...]] = None) -> None:
    """Host-side per-batch guard: compares the model's per-level active-voxel
    counts against the static level capacities (CapacityOverflow) and, for
    the slim zeros-fallback program, the banded span flags (SpansOverflow)."""
    import numpy as np

    counts = np.asarray(output["n_voxels_per_level"])
    caps = (tuple(level_capacities) if level_capacities is not None
            else default_capacities(voxel_capacity, num_blocks))
    for lvl, (n, cap) in enumerate(zip(counts, caps)):
        if int(n) > int(cap):
            raise CapacityOverflow(
                f"{context}level {lvl}: {int(n)} active voxels > capacity "
                f"{cap}. Increase voxel_capacity (currently {voxel_capacity}) "
                f"or shrink the tile.")
    spans_ok = output.get("spans_ok")
    if spans_ok is not None and not bool(np.asarray(spans_ok).all()):
        raise SpansOverflow(
            f"{context}a rulebook overflowed its banded windows under the "
            "slim fast_conv='zeros' program; re-run this batch with "
            "fast_conv=True.")


def analytic_model_flops(n_vox_per_level, n_points: int, channels: int = 32,
                         num_blocks: int = 7, block_reps: int = 2,
                         kernel_size: int = 3, in_channels: int = 4,
                         rule_nnz_per_level=None) -> float:
    """Useful FLOPs of one forward pass from the per-level active-voxel
    counts (model output ``n_voxels_per_level``).

    XLA's cost analysis cannot see FLOPs inside scanned/Pallas bodies, so the
    bench computes the MFU numerator analytically.  With
    ``rule_nnz_per_level`` (model output of the same name) the submanifold
    gather count is exact; otherwise the full k^3 footprint per voxel is
    assumed (a ~2-3x overcount on surface-like sparsity).  Down/inverse convs
    count one contributing corner per fine voxel (their useful MACs); 2 FLOPs
    per MAC.
    """
    import numpy as np

    k = kernel_size ** 3
    v = [float(x) for x in np.asarray(n_vox_per_level)]
    if rule_nnz_per_level is not None:
        nnz = [float(x) for x in np.asarray(rule_nnz_per_level)]
    else:
        nnz = [vi * k for vi in v]
    chans = [channels * (i + 1) for i in range(num_blocks)]
    flops = nnz[0] * in_channels * chans[0] * 2            # input conv
    for lvl, c in enumerate(chans):
        subm = 2 * block_reps * nnz[lvl] * c * c * 2       # head blocks
        if lvl < num_blocks - 1:
            subm += nnz[lvl] * (2 * c) * c * 2             # tail b0 conv1
            subm += (2 * block_reps - 1) * nnz[lvl] * c * c * 2
            c_next = chans[lvl + 1]
            subm += v[lvl] * c * c_next * 2                # down conv
            subm += v[lvl] * c_next * c * 2                # inverse conv
            subm += v[lvl] * (2 * c) * c * 2               # i_branch 1x1
        flops += subm
    heads = n_points * (channels * channels + channels * 2
                        + channels * channels + channels * 3) * 2
    return flops + heads


class TreeLearn:
    """Configuration container + pure init/apply for the network.

    Architecture (reference tree_learn.py:36-46, configs/_modular/model.yaml):
    input SubMConv3d (dim_coord+dim_feat -> channels, k=3) -> UBlock over
    [channels * (i+1)] * num_blocks -> BN+ReLU -> per-point gather -> two MLPs
    (semantic 2-way, offset 3-dim).
    """

    def __init__(
        self,
        channels: int = 32,
        num_blocks: int = 7,
        kernel_size: int = 3,
        dim_coord: int = 3,
        dim_feat: int = 1,
        fixed_modules: Sequence[str] = (),
        use_feats: bool = False,
        use_coords: bool = False,
        spatial_shape: Optional[Sequence[int]] = None,
        max_num_points_per_voxel: int = 3,
        voxel_size: float = 0.1,
        block_reps: int = 2,
        **kwargs,
    ):
        self.channels = channels
        self.num_blocks = num_blocks
        self.kernel_size = kernel_size
        self.dim_coord = dim_coord
        self.dim_feat = dim_feat
        self.fixed_modules = tuple(fixed_modules)
        self.use_feats = use_feats
        self.use_coords = use_coords
        self.spatial_shape = tuple(spatial_shape) if spatial_shape is not None else None
        self.max_pts = max_num_points_per_voxel
        self.voxel_size = voxel_size
        self.block_reps = block_reps
        self.block_channels = [channels * (i + 1) for i in range(num_blocks)]
        self.in_channels = dim_coord + dim_feat

    def config_key(self) -> tuple:
        """Hashable architecture fingerprint: two TreeLearn instances with the
        same key compile to identical programs (used to share compiled eval
        steps across pipeline invocations in one process — re-uploading an
        identical executable to the tunneled device costs seconds-to-minutes)."""
        return (self.channels, self.num_blocks, self.kernel_size,
                self.dim_coord, self.dim_feat, self.fixed_modules,
                self.use_feats, self.use_coords, self.spatial_shape,
                self.max_pts, self.voxel_size, self.block_reps)

    # -- parameters ---------------------------------------------------------

    def init(self, key):
        """Build the parameter pytree (numpy arrays; they migrate to the
        compute device on first use).  ``key`` may be a jax PRNG key, an int
        seed, or an np.random.SeedSequence — initialization itself runs
        entirely in numpy (no XLA programs; ~100 tiny shape-distinct compiles
        otherwise, minutes on a slow host)."""
        if isinstance(key, np.random.SeedSequence):
            ss = key
        elif isinstance(key, (int, np.integer)):
            ss = np.random.SeedSequence(int(key))
        else:
            try:
                data = np.asarray(jax.random.key_data(key))
            except Exception:
                data = np.asarray(key)
            ss = np.random.SeedSequence(
                data.astype(np.uint64).ravel().tolist())
        k0, k1, k2, k3 = ss.spawn(4)
        params, state = {}, {}
        params["input_conv"] = {"0": init_subm_conv(k0, self.kernel_size,
                                                    self.in_channels, self.channels)}
        up, us = init_ublock(k1, self.block_channels, self.block_reps,
                             self.kernel_size)
        params["unet"], state["unet"] = up, us
        bn_p, bn_s = init_bn(self.channels)
        params["output_layer"] = {"0": bn_p}
        state["output_layer"] = {"0": bn_s}
        params["semantic_linear"], state["semantic_linear"] = init_mlp(
            k2, self.channels, 2)
        params["offset_linear"], state["offset_linear"] = init_mlp(
            k3, self.channels, 3)
        return params, state

    # -- forward ------------------------------------------------------------

    def apply(
        self,
        params,
        state,
        coords: jnp.ndarray,       # (N, 3) float32 metric coords (padded)
        input_feats: jnp.ndarray,  # (N, F) float32
        batch_ids: jnp.ndarray,    # (N,) int32
        valid: jnp.ndarray,        # (N,) bool
        *,
        batch_size: int,
        voxel_capacity: int,
        training: bool = False,
        compute_dtype=jnp.float32,
        fast_conv: Optional[bool] = None,
        materialize_rules: Optional[bool] = None,
        level_capacities: Optional[Tuple[int, ...]] = None,
        level_windows: Optional[Tuple[int, ...]] = None,
        probe: Optional[str] = None,
    ):
        """Full forward. Returns (output dict, new_state).

        output: semantic_prediction_logits (N, 2), offset_predictions (N, 3),
        backbone_feats (N, channels) — names parity with reference
        tree_learn.py:97-103.
        """
        if self.spatial_shape is not None:
            key_space = batch_size * int(np.prod(self.spatial_shape))
            assert key_space < 2**31, (
                f"voxel key space {key_space} overflows int32 keys "
                f"(batch_size {batch_size} x spatial_shape {self.spatial_shape}); "
                "reduce the batch size or spatial shape (ops/hashing.py keys)")
        # numpy, not jnp: a concrete device-array constant created during
        # tracing is hoisted as an executable buffer; numpy constants inline
        # into the HLO (see pipeline/inference.py on the jax 0.9 cache issue)
        spatial_shape = (
            np.asarray(self.spatial_shape, np.int32)
            if self.spatial_shape is not None else None
        )
        vb = voxelize_points(
            coords, input_feats, batch_ids, valid,
            batch_size=batch_size, voxel_size=self.voxel_size,
            capacity=voxel_capacity, max_pts=self.max_pts,
            spatial_shape=spatial_shape,
            use_coords=self.use_coords, use_feats=self.use_feats,
        )
        if probe == "voxelize":
            # bench decomposition probe: voxelize + v2p only (the token
            # depends on every output so nothing is dead-code-eliminated)
            tok = (vb.n_voxels + jnp.sum(vb.voxel_feats)
                   + jnp.sum(vb.v2p_map == voxel_capacity))
            return {"probe_token": tok}, {}
        if probe == "heads":
            # voxelize + devoxelize-gather + both head MLPs at real shapes,
            # no U-Net: isolates the non-conv epilogue cost
            x = (jnp.zeros((voxel_capacity, self.channels), compute_dtype)
                 + vb.voxel_feats[:, :1])
            backbone_feats = devoxelize(x, vb.v2p_map)
            sem, _ = apply_mlp(params["semantic_linear"],
                               state["semantic_linear"], backbone_feats,
                               valid, training=False, frozen=True)
            off, _ = apply_mlp(params["offset_linear"], state["offset_linear"],
                               backbone_feats, valid, training=False,
                               frozen=True)
            return {"probe_token": jnp.sum(sem) + jnp.sum(off)}, {}

        if fast_conv is None:
            # default on TPU: the slim zeros-fallback program (executable is
            # ~2/3 the size; span overflows surface via check_capacity and
            # the caller retries with fast_conv=True)
            fast_conv = "zeros" if jax.default_backend() == "tpu" else False

        if level_capacities is not None:
            # measured per-level capacities (whole-plot mode: the host counts
            # active voxels per level exactly via level_voxel_counts_np,
            # instead of assuming the halve-per-level schedule)
            assert len(level_capacities) == self.num_blocks, level_capacities
            assert level_capacities[0] == voxel_capacity, (
                "level_capacities[0] must equal voxel_capacity (the voxel "
                f"buffer size): {level_capacities[0]} != {voxel_capacity}")
            caps = tuple(int(c) for c in level_capacities)
        else:
            caps = default_capacities(voxel_capacity, self.num_blocks)
        grid0 = grid_from_sorted_keys(vb.voxel_keys, vb.spatial_shape, vb.n_voxels)
        if materialize_rules is None:
            # only fast_conv=True gradient programs must materialize rules:
            # their backward invokes the lazy in-branch rule_thunk, which
            # closes over tracers that custom_vjp's backward trace cannot
            # consume (leaked-tracer TypeError).  The "zeros"-fallback
            # gradient program never calls the thunk (its out-of-window
            # branches return zeros and the train step no-ops the update on
            # the spans_ok flag), so it trains rule-free.
            materialize_rules = training and fast_conv is True
        plans = build_level_plans(grid0, self.num_blocks, self.kernel_size, caps,
                                  static_spatial_shape=self.spatial_shape,
                                  batch_size=batch_size,
                                  # fast no-grad programs skip the (27, V)
                                  # rules: spans come from the Pallas rd
                                  # kernel (ops/pallas_rd.py); the
                                  # fast_conv=True program's XLA fallback
                                  # builds its rule lazily inside the cond
                                  # branch
                                  rule_free=bool(fast_conv)
                                  and not materialize_rules,
                                  level_windows=level_windows)
        if probe == "plans":
            # voxelize + full per-level plan/rulebook build, no convs: the
            # token touches every level's grid and span tables
            tok = vb.n_voxels.astype(jnp.int64)
            for p in plans:
                tok = tok + p.grid.n_active
                tok = tok + (jnp.sum(p.subm_rule >= 0, dtype=jnp.int32)
                             if p.subm_rule is not None
                             else rd_nnz(p.subm_spans.rd))
            return {"probe_token": tok}, {}
        x = vb.voxel_feats.astype(compute_dtype)
        new_state = {}
        frozen = lambda name: name in self.fixed_modules  # noqa: E731

        from .blocks import _subm
        from ..ops.sparse import build_subm_rulebook as _bsr
        x = _subm(x, params["input_conv"]["0"]["weight"],
                  plans[0].subm_rule, grid0.live_mask, fast_conv,
                  spans=plans[0].subm_spans,
                  tile_window=plans[0].tile_window,
                  rule_thunk=(None if plans[0].subm_rule is not None
                              else (lambda: _bsr(plans[0].grid, 3))))

        x, s = apply_ublock(params["unet"], state["unet"], x, plans, 0,
                            block_reps=self.block_reps, training=training,
                            frozen=frozen("unet"), fast=fast_conv)
        new_state["unet"] = s

        x, s = apply_bn(params["output_layer"]["0"], state["output_layer"]["0"],
                        x, grid0.live_mask, training=training,
                        frozen=frozen("output_layer"))
        new_state["output_layer"] = {"0": s}
        x = jax.nn.relu(x)

        # voxel -> point gather (reference tree_learn.py:99)
        backbone_feats = devoxelize(x, vb.v2p_map)

        sem, s = apply_mlp(params["semantic_linear"], state["semantic_linear"],
                           backbone_feats, valid, training=training,
                           frozen=frozen("semantic_linear"))
        new_state["semantic_linear"] = s
        off, s = apply_mlp(params["offset_linear"], state["offset_linear"],
                           backbone_feats, valid, training=training,
                           frozen=frozen("offset_linear"))
        new_state["offset_linear"] = s

        output = {
            "semantic_prediction_logits": sem.astype(jnp.float32),
            "offset_predictions": off.astype(jnp.float32),
            "backbone_feats": backbone_feats.astype(jnp.float32),
            "n_voxels": vb.n_voxels,
            # per-level active counts for host-side overflow guards: a count
            # above its level capacity means voxels were silently dropped
            "n_voxels_per_level": jnp.stack([p.grid.n_active for p in plans]),
            # per-level subm-rulebook nnz: the exact gather count, used by the
            # bench to compute useful conv FLOPs (the k^3-footprint analytic
            # formula overcounts ~2-3x on surface-like sparsity)
            "rule_nnz_per_level": jnp.stack(
                [jnp.sum(p.subm_rule >= 0, dtype=jnp.int32)
                 if p.subm_rule is not None else rd_nnz(p.subm_spans.rd)
                 for p in plans]),
        }
        if fast_conv == "zeros":
            # span-ok flags of every rulebook: all True => the slim program's
            # output is exact; any False => caller re-runs with fast_conv=True
            flags = []
            for p in plans:
                for sp in (p.subm_spans, p.down_spans, p.inv_spans):
                    if sp is not None:
                        flags.append(sp.ok)
            output["spans_ok"] = jnp.stack(flags)
        return output, new_state

    def make_forward(self, *, batch_size: int, voxel_capacity: int,
                     training: bool = False, compute_dtype=jnp.float32):
        """A jit-compiled forward closed over static config."""

        @partial(jax.jit, static_argnames=())
        def fwd(params, state, coords, input_feats, batch_ids, valid):
            return self.apply(
                params, state, coords, input_feats, batch_ids, valid,
                batch_size=batch_size, voxel_capacity=voxel_capacity,
                training=training, compute_dtype=compute_dtype,
            )

        return fwd
