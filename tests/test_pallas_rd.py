"""Banded rd-builder kernel (ops/pallas_rd.py) vs the rule-based spans.

The kernel must reproduce rule_spans(build_subm_rulebook(...)).rd exactly —
including boundary-wrap exclusion (a key comparison alone cannot tell
(x, y, 0)+dz=-1 from (x, y-1, sz-1)) and batch-prefix handling.
Reference semantics: spconv SubMConv3d rulebook (reference model/blocks.py:57).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from treelearn_tpu.ops.hashing import SENTINEL
from treelearn_tpu.ops.pallas_conv import rule_spans
from treelearn_tpu.ops.pallas_rd import band_deltas, build_spans_banded, rd_nnz
from treelearn_tpu.ops.sparse import (build_dense_table, build_subm_rulebook,
                                      grid_from_sorted_keys)


def _case(seed, ss, v, n, batch=1, boundary_heavy=False):
    rng = np.random.default_rng(seed)
    space = int(np.prod(ss))
    keys = []
    for b in range(batch):
        if boundary_heavy:
            # cluster voxels on the grid faces to stress wrap exclusion
            x = rng.choice([0, 1, ss[0] - 1], n)
            y = rng.integers(0, ss[1], n)
            z = rng.choice([0, 1, ss[2] - 2, ss[2] - 1], n)
            k = ((b * ss[0] + x) * ss[1] + y) * ss[2] + z
        else:
            k = b * space + rng.choice(space, n, replace=False)
        keys.append(np.unique(k.astype(np.int64)))
    allk = np.concatenate(keys)
    allk = np.unique(allk)[: v]
    pad = np.full(v, np.iinfo(np.int32).max, np.int32)
    pad[: len(allk)] = np.sort(allk).astype(np.int32)
    return pad, len(allk)


@pytest.mark.parametrize("seed,ss,batch,boundary", [
    (0, (20, 24, 16), 1, False),
    (1, (20, 24, 16), 1, True),
    (2, (12, 10, 8), 3, False),
    (3, (12, 10, 8), 2, True),
])
def test_rd_matches_rule_spans(seed, ss, batch, boundary, monkeypatch):
    import treelearn_tpu.ops.pallas_rd as prd

    monkeypatch.setattr(prd, "_INTERPRET", True)
    v = 2048
    keys, n = _case(seed, ss, v, 600, batch=batch, boundary_heavy=boundary)
    kj = jnp.asarray(keys)
    g = grid_from_sorted_keys(kj, jnp.asarray(np.array(ss, np.int32)),
                              jnp.int32(n))
    table = build_dense_table(g, batch * int(np.prod(ss)))
    rule = build_subm_rulebook(g, 3, dense_table=table)
    tile, window = 128, 512
    sp_ref = rule_spans(rule, tile, window, v)
    sp_new = build_spans_banded(kj, spatial_shape=tuple(ss), capacity=v,
                                tile=tile, window=window)
    np.testing.assert_array_equal(np.asarray(sp_new.rd), np.asarray(sp_ref.rd))
    assert int(np.asarray(rd_nnz(sp_new.rd))) == int(np.asarray(
        jnp.sum(rule >= 0)))
    # new lo placement may differ (128- vs 64-alignment) but must satisfy the
    # coverage invariant whenever ok: every r0 within [lo, lo + window - 8]
    if bool(np.asarray(sp_new.ok)):
        rd = np.asarray(sp_new.rd)
        lo = np.asarray(sp_new.lo)
        ntiles = v // tile
        for b in range(9):
            r0 = np.where(rd[b] >= 0, rd[b] >> 6, -1).reshape(ntiles, tile)
            for t in range(ntiles):
                live = r0[t] >= 0
                if live.any():
                    rel = r0[t][live] - lo[b, t]
                    assert rel.min() >= 0 and rel.max() <= window - 8


def test_band_deltas_order():
    # must match kernel_offsets(3) reshaped (9, 3): dz fastest, dy middle
    from treelearn_tpu.ops.sparse import kernel_offsets

    offs = np.asarray(kernel_offsets(3)).reshape(9, 3, 3)
    ss = (10, 11, 12)
    for b, (dx, dy, delta) in enumerate(band_deltas(ss)):
        assert (offs[b, :, 0] == dx).all() and (offs[b, :, 1] == dy).all()
        assert delta == dx * ss[1] * ss[2] + dy * ss[2]
        np.testing.assert_array_equal(offs[b, :, 2], [-1, 0, 1])
