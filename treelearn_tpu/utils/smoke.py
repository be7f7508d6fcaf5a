"""Compiled-kernel smoke checks on the real accelerator.

The Pallas kernels are unit-tested in interpret mode on CPU
(tests/test_pallas_*.py); the Mosaic-COMPILED lowerings were previously
exercised only implicitly by the bench, where a silent numeric regression
would surface as wrong output, not a red check.  ``run_tpu_smoke`` runs every
kernel family against its exact oracle on small shapes ON DEVICE and returns
a pass/fail table that bench.py embeds in its JSON (``tpu_smoke``).

Oracles: the XLA fallback implementations (same semantics, no Pallas) and
exact numpy where cheaper.  Shapes are small so cold compiles stay under a
minute total and the persistent compile cache removes them afterwards.
"""

from __future__ import annotations

import numpy as np


def _sorted_keys_case(ss=(64, 64, 48), n=1500, v=2048, seed=0):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.choice(int(np.prod(ss)), n, replace=False)
                     .astype(np.int64)).astype(np.int32)
    pad = np.full(v, np.iinfo(np.int32).max, np.int32)
    pad[: len(keys)] = np.sort(keys)
    return pad, len(keys), ss


def run_tpu_smoke() -> dict:
    """Returns {"passed": N, "failed": M, "checks": {name: bool}}."""
    import jax
    import jax.numpy as jnp

    from ..ops.pallas_conv import rule_spans, subm_conv_banded
    from ..ops.pallas_rd import build_spans_banded, rd_nnz
    from ..ops.sparse import (build_dense_table, build_subm_rulebook,
                              grid_from_sorted_keys, subm_conv)

    checks = {}
    rng = np.random.default_rng(7)

    # --- shared sparse case -------------------------------------------------
    keys, n, ss = _sorted_keys_case()
    v = len(keys)
    kj = jnp.asarray(keys)
    grid = grid_from_sorted_keys(kj, jnp.asarray(np.array(ss, np.int32)),
                                 jnp.int32(n))
    table = build_dense_table(grid, int(np.prod(ss)))
    rule = jax.jit(lambda g, t: build_subm_rulebook(g, 3, dense_table=t))(
        grid, table)
    tile, window = 256, 1024

    # 1. rd builder vs rule-based spans (exact int equality)
    try:
        sp_ref = jax.jit(lambda r: rule_spans(r, tile, window, v))(rule)
        sp_new = build_spans_banded(kj, spatial_shape=ss, capacity=v,
                                    tile=tile, window=window)
        checks["pallas_rd"] = bool(
            (np.asarray(sp_new.rd) == np.asarray(sp_ref.rd)).all()
            and int(np.asarray(rd_nnz(sp_new.rd)))
            == int(np.asarray(jnp.sum(rule >= 0))))
    except Exception:
        checks["pallas_rd"] = False

    # 2. banded subm conv vs XLA gather conv (bf16 tolerance)
    try:
        feats = jnp.asarray(
            rng.normal(size=(v, 32)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(
            (rng.normal(size=(27, 32, 32)) * 0.1).astype(np.float32),
            jnp.bfloat16)
        spans = sp_new if checks.get("pallas_rd") else jax.jit(
            lambda r: rule_spans(r, tile, window, v))(rule)
        fast = np.asarray(
            subm_conv_banded(feats, w, rule, grid.live_mask,
                             tile=tile, window=window, spans=spans),
            np.float32)
        ref = np.asarray(
            jax.jit(subm_conv)(feats, w, rule, grid.live_mask), np.float32)
        checks["pallas_conv"] = bool(
            np.isfinite(fast).all()
            and np.max(np.abs(fast - ref)) < 0.25
            and np.abs(fast - ref).mean() < 0.01)
    except Exception:
        checks["pallas_conv"] = False

    # 3. banded connected components vs exact numpy eps-graph partition
    try:
        from ..ops.cluster import relabel_components_np
        from ..ops.pallas_cc import cc_labels_banded

        blobs = []
        centers = rng.uniform(0, 12, (6, 2))
        for c in centers:
            blobs.append(c + rng.normal(0, 0.03, (120, 2)))
        xy = np.vstack(blobs + [rng.uniform(0, 12, (80, 2))]).astype(np.float32)
        ours = relabel_components_np(cc_labels_banded(xy, eps=0.15), 1, -1, 0)

        # exact O(n^2) oracle
        d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
        adj = d2 <= 0.15 * 0.15
        lab = np.full(len(xy), -1)
        cur = 0
        for i in range(len(xy)):
            if lab[i] >= 0:
                continue
            stack = [i]
            lab[i] = cur
            while stack:
                j = stack.pop()
                nbrs = np.flatnonzero(adj[j] & (lab < 0))
                lab[nbrs] = cur
                stack.extend(nbrs.tolist())
            cur += 1
        pairs = set(zip(ours.tolist(), lab.tolist()))
        checks["pallas_cc"] = (len(pairs) == len(set(ours.tolist()))
                               == len(set(lab.tolist())))
    except Exception:
        checks["pallas_cc"] = False

    # 4. banded k-NN classify vs exact numpy majority vote
    try:
        from ..ops.pallas_knn import banded_knn_classify

        ref_pts = rng.uniform(0, 8, (3000, 3)).astype(np.float32)
        ref_lab = rng.integers(1, 9, 3000).astype(np.int64)
        q = rng.uniform(0, 8, (500, 3)).astype(np.float32)
        ours = banded_knn_classify(ref_pts, ref_lab, q, k=5,
                                   small_refs_kdtree=False)
        d2 = ((q[:, None, :] - ref_pts[None, :, :]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :5]
        exact = np.array([np.bincount(ref_lab[r]).argmax() for r in idx])
        agree = float((np.asarray(ours) == exact).mean())
        # distance ties can legitimately flip votes; demand near-total accord
        checks["pallas_knn"] = agree >= 0.99
    except Exception:
        checks["pallas_knn"] = False

    # 5. banded verticality vs the closed-form numpy oracle
    try:
        from ..ops.pallas_vert import verticality_banded

        pts = rng.uniform(0, 6, (4000, 3)).astype(np.float32)
        qpts = pts[rng.choice(4000, 400, replace=False)]
        vert, cnt, over = verticality_banded(pts, qpts, 0.6)
        d2 = ((qpts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        ok_rows = ~over
        exact = np.full(len(qpts), np.nan, np.float32)
        for i in np.flatnonzero(ok_rows):
            nb = pts[d2[i] <= 0.36]
            if len(nb) < 3:
                continue
            cov = np.cov(nb.T, bias=True)
            wv, ev = np.linalg.eigh(cov)
            exact[i] = 1.0 - abs(ev[2, 0])
        m = ok_rows & ~np.isnan(exact)
        cnt_exact = (d2[m] <= 0.36).sum(axis=1)
        checks["pallas_vert"] = bool(
            m.any()
            and np.allclose(np.asarray(cnt)[m], cnt_exact)
            and np.max(np.abs(np.asarray(vert)[m] - exact[m])) < 5e-2)
    except Exception:
        checks["pallas_vert"] = False

    # 6. device HDBSCAN at plot scale (VERDICT r4 item 4): the eps-ladder +
    # hierarchical-coarsening path (ops/hdbscan.py:_level_components) over
    # >=200k candidates shaped like offset-shifted tree bases — dense knots
    # on clutter, the layout that degenerates naive grid CC.  Checks cluster
    # recovery, not timing (the default grouping gate routes sizes like this
    # to the weighted host path for speed; this records that the DEVICE
    # engine scales correctly past the old 50k ceiling).
    try:
        import os as _os
        import time as _time

        from ..ops.hdbscan import hdbscan_cluster

        n_knots = 96
        rng2 = np.random.default_rng(3)
        centers = rng2.uniform(0, 240, (n_knots, 2)).astype(np.float32)
        knots = (centers[:, None, :]
                 + rng2.normal(0, 0.25, (n_knots, 2000, 2))).reshape(-1, 2)
        clutter = rng2.uniform(0, 240, (28000, 2))
        pts = np.concatenate([knots, clutter]).astype(np.float32)  # 220k
        t0 = _time.time()
        prev = _os.environ.get("TL_HDBSCAN_DEVICE_MAX")
        _os.environ["TL_HDBSCAN_DEVICE_MAX"] = str(1 << 20)
        try:
            lab = hdbscan_cluster(pts, min_cluster_size=50,
                                  not_assigned_label=-1, start_num=1)
        finally:
            if prev is None:
                _os.environ.pop("TL_HDBSCAN_DEVICE_MAX", None)
            else:
                _os.environ["TL_HDBSCAN_DEVICE_MAX"] = prev
        # every knot recovered as one big cluster (>=1500 of its 2000 pts)
        knot_ids = np.repeat(np.arange(n_knots), 2000)
        knot_lab = lab[: n_knots * 2000]
        good = 0
        for kn in range(n_knots):
            vals, cnts = np.unique(knot_lab[knot_ids == kn], return_counts=True)
            top = vals[cnts.argmax()]
            if top >= 1 and cnts.max() >= 1500:
                good += 1
        n_clusters = len(np.unique(lab[lab >= 1]))
        # adjacent random knots can legitimately merge (sklearn does too):
        # bound the count loosely; `good` carries the real recovery signal
        checks["hdbscan_device_220k"] = bool(
            good >= int(0.95 * n_knots)
            and int(0.9 * n_knots) <= n_clusters <= int(1.3 * n_knots))
        extras = {"hdbscan_device_220k_seconds": round(_time.time() - t0, 1)}
    except Exception:
        checks["hdbscan_device_220k"] = False
        extras = {}

    passed = sum(bool(x) for x in checks.values())
    return {"passed": passed, "failed": len(checks) - passed,
            "checks": {k: bool(x) for k, x in checks.items()}, **extras}
