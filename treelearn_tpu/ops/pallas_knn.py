"""Pallas TPU kernel for grid k-NN: banded per-band top-k extraction.

Third use of the banded neighborhood structure (ops/pallas_vert.py,
ops/pallas_cc.py): both sides sorted by xy cell key, three contiguous ref
windows per query tile (cell rows di in {-1,0,1}), dense (T, W) distance
matrices on the VPU.  Per band the kernel extracts the k nearest in-radius
refs by iterative min-extraction (min over lanes -> label readout at the
argmin by masked max -> mask out), writing (d2, label) pairs into 2*k*3
output lanes; the XLA side of the same jit merges the three per-band top-k
lists (their union provably contains the global top-k) and majority-votes,
so only the winner label and found-count per query cross the tunnel.

Queries with fewer than k in-radius neighbors escalate to a 4x coarser cell
grid (re-sort + re-run, same as ops/cluster.py:grid_knn), and final
stragglers go to the exact streaming brute-force pass.  Results are exact
w.r.t. brute force up to distance ties (float-equal distances vote
equivalently).

Replaces the XLA capped-gather grid pass on TPU: 150k clumped queries took
5.7 s there (9 cells x 256-candidate gathers) vs ~0.6 s banded.
Reference semantics: KNeighborsClassifier 5-NN majority assignment
(reference tree_learn/util/pipeline.py:287-331).
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 64
MAX_WINDOW = 4096
_ALIGN = 128
_GRID_WIDTH = 30000

_INTERPRET = os.environ.get("TL_PALLAS_INTERPRET", "0") == "1"

# ref matrix rows (feature-major, (8, V)): [valid, x, y, z, i, j, label]
# query matrix columns ((Q, 8)): [x, y, z, i, j, valid]


def _knn_kernel(lo_ref, n_live_ref, q_ref, refs_hbm, out_ref, window_buf,
                acc_ref, sems, *, window, tile, radius, k):
    t = pl.program_id(0)
    out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(t * tile < n_live_ref[0])
    def _():
        def dma(band, slot):
            start = pl.multiple_of(lo_ref[band, t], _ALIGN)
            return pltpu.make_async_copy(
                refs_hbm.at[:, pl.ds(start, window)],
                window_buf.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        qx = q_ref[:, 0:1]
        qy = q_ref[:, 1:2]
        qz = q_ref[:, 2:3]
        qi = q_ref[:, 3:4]
        qj = q_ref[:, 4:5]
        qvalid = q_ref[:, 5:6] > 0.0

        r2 = jnp.float32(radius * radius)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        inf = jnp.float32(np.inf)

        for band in range(3):
            slot = band % 2
            if band + 1 < 3:
                dma(band + 1, (band + 1) % 2).start()
            dma(band, slot).wait()

            win = window_buf[slot]
            wvalid = win[0:1, :]
            wx = win[1:2, :]
            wy = win[2:3, :]
            wz = win[3:4, :]
            wi = win[4:5, :]
            wj = win[5:6, :]
            wlab = win[6:7, :]

            dx = wx - qx
            dy = wy - qy
            dz = wz - qz
            d2 = dx * dx + dy * dy + dz * dz

            di = jnp.float32(band - 1)
            ok = ((d2 <= r2)
                  & (wi == qi + di)
                  & (jnp.abs(wj - qj) <= 1.0)
                  & (wvalid > 0.0)
                  & qvalid)
            d2m = jnp.where(ok, d2, inf)                    # (T, W)

            for r in range(k):
                dmin = jnp.min(d2m, axis=1, keepdims=True)  # (T, 1)
                is_min = d2m == dmin                         # ties extract together
                lab = jnp.max(jnp.where(is_min, wlab, -1.0), axis=1,
                              keepdims=True)
                base = 2 * (band * k + r)
                # missing neighbor: dmin == inf; store label -1
                acc_ref[:] += jnp.where(lane == base,
                                        jnp.where(jnp.isinf(dmin), -1.0, lab),
                                        0.0)
                acc_ref[:] += jnp.where(lane == base + 1,
                                        jnp.where(jnp.isinf(dmin),
                                                  jnp.float32(3e38), dmin),
                                        0.0)
                d2m = jnp.where(is_min, inf, d2m)

        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("tile", "window", "k"))
def _knn_pallas_call(lo, n_live, q_pts, pts_sorted, lab_sorted, nums_i,
                     nums_f, *, tile, window, k):
    # Coordinates are scaled by 1/cell IN-JIT, so the in-radius test is the
    # STATIC constant 1.0 — one compiled program serves every escalation
    # round and every dataset extent (a static radius would recompile per
    # cell size).  Like ops/pallas_vert.py, both feature matrices are built
    # on device from the raw sorted coordinates + labels: the host-built
    # (8, V) + (Q, 8) layouts shipped ~2.4x the bytes through the tunnel.
    # ``nums_i`` = int32 [nq, nr, min_i, min_j]; ``nums_f`` = f32
    # [cell, inv_cell] (dynamic: cell changes per escalation round).  Cell
    # indices AND scaled coords both come from multiplication by the host's
    # inv_cell value: f32 multiply is correctly rounded on the TPU VPU, f32
    # division is not — the host span-table mirror (_banded_knn_pass) uses
    # the identical multiply, so boundary points cannot drift cells between
    # the two sides.  nums_f[0] (cell) is kept for signature stability.
    nq_pad = q_pts.shape[0]
    v_pad = pts_sorted.shape[0]
    n_q, n_r = nums_i[0], nums_i[1]
    mins = nums_i[2:4]
    inv_cell = nums_f[1]

    ij_q = (jnp.floor(q_pts[:, :2] * inv_cell).astype(jnp.int32)
            - mins[None, :]).astype(jnp.float32)
    qvalid = (jnp.arange(nq_pad, dtype=jnp.int32) < n_q)
    q_mat = (jnp.zeros((nq_pad, 128), jnp.float32)
             .at[:, 0:3].set(q_pts * inv_cell)
             .at[:, 3:5].set(ij_q)
             .at[:, 5].set(qvalid.astype(jnp.float32)))

    rvalid = (jnp.arange(v_pad, dtype=jnp.int32) < n_r)
    ij_r = (jnp.floor(pts_sorted[:, :2] * inv_cell).astype(jnp.int32)
            - mins[None, :]).astype(jnp.float32)
    ref_mat = (jnp.zeros((8, v_pad), jnp.float32)
               .at[0, :].set(rvalid.astype(jnp.float32))
               .at[1:4, :].set((pts_sorted * inv_cell).T)
               .at[4:6, :].set(jnp.where(rvalid[None, :], ij_r.T, 0.0))
               .at[6, :].set(lab_sorted))
    nq = nq_pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nq // tile,),
        in_specs=[
            pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((tile, 128), lambda t, lo, nl: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, window), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_knn_kernel, window=window, tile=tile,
                          radius=1.0, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(lo, n_live, q_mat, ref_mat)

    # merge the 3 per-band top-k lists and majority-vote ON DEVICE: only the
    # winner label and found-count cross the tunnel (the (Q, 6k) f32 block is
    # ~18 MB at pipeline scale and device->host runs as slow as ~0.1 MB/s
    # under tunnel contention)
    labs = acc[:, 0:6 * k:2]                      # (Q, 3k) band-major
    d2s = acc[:, 1:6 * k:2]
    neg, sel = jax.lax.top_k(-d2s, k)             # k smallest distances
    top_lab = jnp.take_along_axis(labs, sel, axis=1)
    found = (-neg) < 1e37
    n_found = jnp.sum(found, axis=1).astype(jnp.int32)
    votes = jnp.where(found, top_lab, -1.0)
    counts = jnp.sum(votes[:, :, None] == votes[:, None, :], axis=2)
    # tie-break parity with np.bincount argmax: smallest label among the
    # most-frequent — sort votes ascending, count, take first argmax
    order = jnp.argsort(votes, axis=1)
    votes_sorted = jnp.take_along_axis(votes, order, axis=1)
    counts_sorted = jnp.take_along_axis(counts, order, axis=1)
    winner = jnp.take_along_axis(
        votes_sorted, jnp.argmax(counts_sorted, axis=1)[:, None], axis=1)[:, 0]
    # pack (winner, found>=k) into ONE int32 per query: D2H bytes are the
    # scarce resource (see module docstring); winner labels are >= 0 and far
    # below 2^30
    packed = jnp.where(n_found >= k,
                       winner.astype(jnp.int32) | jnp.int32(1 << 30),
                       jnp.int32(0))
    return packed


def _banded_knn_pass(ref_pts, ref_labels, query_pts, cell, k,
                     tile=DEFAULT_TILE):
    """One banded pass: (winner_label (Q,), done (Q,) bool, overflow_frac)
    with neighbors restricted to distance <= cell; the k-NN majority vote
    runs on device and the result ships as one packed int32 per query.
    Overflowing tiles report not-done (their queries escalate)."""
    nr, nq = len(ref_pts), len(query_pts)
    width = _GRID_WIDTH

    # same f32 reciprocal-multiply as the device (_knn_pallas_call): f32
    # multiply is IEEE on both sides, division on the TPU VPU is not
    inv_cell32 = np.float32(1.0) / np.float32(cell)
    ij_r = np.floor(ref_pts[:, :2] * inv_cell32).astype(np.int64)
    ij_q = np.floor(query_pts[:, :2] * inv_cell32).astype(np.int64)
    mins = np.minimum(ij_r.min(axis=0), ij_q.min(axis=0))
    ij_r -= mins
    ij_q -= mins
    keys_r = ij_r[:, 0] * width + ij_r[:, 1]
    keys_q = ij_q[:, 0] * width + ij_q[:, 1]
    order_r = np.argsort(keys_r, kind="stable")
    order_q = np.argsort(keys_q, kind="stable")
    skeys_r = keys_r[order_r]
    skeys_q = keys_q[order_q]

    ntiles = int(np.ceil(nq / tile))
    q_pad = ntiles * tile
    k_min = skeys_q[np.arange(ntiles) * tile]
    k_max = skeys_q[np.minimum((np.arange(ntiles) + 1) * tile, nq) - 1]
    lo_raw = np.zeros((3, ntiles), np.int64)
    hi_raw = np.zeros((3, ntiles), np.int64)
    for band, di in enumerate((-1, 0, 1)):
        lo_raw[band] = (np.searchsorted(skeys_r, k_min + di * width - 1,
                                        "left") // _ALIGN) * _ALIGN
        hi_raw[band] = np.searchsorted(skeys_r, k_max + di * width + 2,
                                       "left")
    # size the window for the TYPICAL tile (90th-percentile span): on clumped
    # data the worst tile can need 10x the median window, and overflowing
    # tiles escalate to the next round anyway — sizing for the max would make
    # every tile pay its DMA cost
    spans = (hi_raw - lo_raw)
    span = int(np.percentile(spans, 90)) if ntiles else _ALIGN
    window = int(min(max(1 << int(np.ceil(np.log2(max(span, _ALIGN)))),
                         _ALIGN), MAX_WINDOW))
    # pow2 bucket: stable jit shapes across plots/rounds (see pallas_vert)
    v_pad = max(1 << int(np.ceil(np.log2(max(nr, _ALIGN)))), window)
    lo = np.clip(lo_raw, 0, v_pad - window).astype(np.int32)
    overflow_tiles = (hi_raw > lo + window).any(axis=0)

    # only raw sorted coordinates + labels cross the wire; scaling, cell
    # indices and layouts are built in-jit (_knn_pallas_call)
    pts_sorted = np.zeros((v_pad, 3), np.float32)
    pts_sorted[:nr] = ref_pts[order_r, :3]
    lab_sorted = np.zeros(v_pad, np.float32)
    lab_sorted[:nr] = ref_labels[order_r]
    q_pts = np.zeros((q_pad, 3), np.float32)
    q_pts[:nq] = query_pts[order_q, :3]
    nums_i = np.asarray([nq, nr, mins[0], mins[1]], np.int32)
    nums_f = np.asarray([cell, inv_cell32], np.float32)

    packed = np.asarray(_knn_pallas_call(
        jnp.asarray(lo), jnp.asarray([nq], np.int32), jnp.asarray(q_pts),
        jnp.asarray(pts_sorted), jnp.asarray(lab_sorted),
        jnp.asarray(nums_i), jnp.asarray(nums_f),
        tile=tile, window=window, k=int(k)))[:nq]
    done = packed >= (1 << 30)
    winner = np.where(done, packed & ~(1 << 30), -1)

    # queries of overflowing tiles saw clipped windows: force re-run
    over = np.repeat(overflow_tiles, tile)[:nq]
    done &= ~over

    inv = np.empty(nq, np.int64)
    inv[order_q] = np.arange(nq)
    return (winner[inv].astype(np.int64), done[inv],
            float(overflow_tiles.mean()) if ntiles else 0.0)


def _kdtree_vote(ref_pts, enc, query_pts, k):
    """Exact k-NN majority vote via the host KD-tree (the same structure the
    reference's KNeighborsClassifier uses, util/pipeline.py:292).  Returns
    None when scipy is unavailable (callers fall through to device paths)."""
    try:
        from scipy.spatial import cKDTree
    except ImportError:  # pragma: no cover - scipy ships in-image
        return None
    k_eff = min(int(k), len(ref_pts))
    _, nn = cKDTree(ref_pts).query(query_pts, k=k_eff, workers=-1)
    nn = nn.reshape(len(query_pts), k_eff)
    votes = np.sort(enc[nn], axis=1)
    counts = (votes[:, :, None] == votes[:, None, :]).sum(axis=2)
    return np.take_along_axis(votes, counts.argmax(axis=1)[:, None],
                              axis=1)[:, 0]


def banded_knn_classify(ref_pts: np.ndarray, ref_labels: np.ndarray,
                        query_pts: np.ndarray, k: int = 5,
                        max_rounds: int = 6,
                        small_refs_kdtree: bool = True) -> np.ndarray:
    """Majority vote over the k nearest refs, banded kernel with cell-size
    escalation; exact vs brute force (up to float-equal distance ties).
    ``small_refs_kdtree=False`` forces the device path (kernel tests)."""
    from .cluster import brute_knn

    ref_pts = np.asarray(ref_pts, np.float32)
    query_pts = np.asarray(query_pts, np.float32)
    ref_labels = np.asarray(ref_labels)
    nq, nr = len(query_pts), len(ref_pts)
    if nq == 0:
        return np.zeros(0, np.int64)

    enc = ref_labels.astype(np.int64)
    base = int(enc.min()) if nr else 0
    enc = enc - base + 1          # kernel label readout needs labels >= 1

    if (small_refs_kdtree and nr
            and nr <= int(os.environ.get("TL_KNN_SMALL_REFS", 1 << 17))):
        # small ref sets — the remaining-point assignment's refs are a few
        # hundred tight cluster blobs (reference util/pipeline.py:287-296) —
        # are the banded kernel's worst case: refs clump, queries spread, so
        # escalation rounds resolve almost nothing (measured 208 s for
        # 450k x 16k on interlocked crowns) while a host KD-tree answers the
        # same problem exactly in ~1 s.  Build cost is trivial at this size.
        res = _kdtree_vote(ref_pts, enc, query_pts, k)
        if res is not None:
            return res + base - 1
    result = np.full(nq, -1, np.int64)
    need = np.ones(nq, bool)
    use_banded = nr >= k
    if use_banded and nq * max(nr, 1) > float(os.environ.get(
            "TL_KNN_KDTREE_MIN_PAIRS", 2e10)):
        # plot-scale problems go straight to the exact host KD-tree backstop
        # below: at 1.46M x 1.1M it answers in ~9 s, cheaper than even ONE
        # banded round (each round sorts the refs and streams every window)
        use_banded = False
    if use_banded and nr and int(enc.max()) >= (1 << 24):
        # labels ride through the kernel as float32 (ref_mat row 6) and pack
        # into int32 under a bit-30 done flag: encoded ids >= 2^24 lose float
        # precision and >= 2^30 collide with the flag.  enc starts at 1, so
        # this only triggers for ~16M distinct raw ids — route those to the
        # exact brute-force path instead of risking silent wrong labels.
        use_banded = False
    if use_banded and nq > 1 << 17:
        # probe a sample before committing millions of queries to banded
        # rounds: on clumped refs with spread-out queries (offset-shifted
        # canopies) the grid cell that bounds the window DMA is far below
        # typical 3D neighbor distances, so the rounds find almost nothing
        # and the brute pass does the real work anyway (measured 537s of
        # banded for a 1.4% hit rate at 3M queries before this gate).
        rng = np.random.default_rng(0)
        sample = query_pts[rng.choice(nq, 1 << 14, replace=False)]
        extent = np.ptp(ref_pts[:, :2], axis=0).max() + 1e-6
        cell0 = max(extent / np.sqrt(max(nr, 1) / 32.0), 1e-3)
        enc0 = ref_labels.astype(np.int64)
        enc0 = enc0 - (int(enc0.min()) if nr else 0) + 1
        _, done_s, _ = _banded_knn_pass(ref_pts, enc0, sample, float(cell0), k)
        if done_s.mean() < 0.25:
            use_banded = False
    if use_banded:
        extent = np.ptp(ref_pts[:, :2], axis=0).max() + 1e-6
        cell = max(extent / np.sqrt(max(nr, 1) / 32.0), 1e-3)
        debug = os.environ.get("TL_KNN_DEBUG") == "1"
        for rnd in range(max_rounds):
            if not need.any():
                break
            idx = np.where(need)[0]
            t0 = time.time() if debug else 0.0
            winner, done, overflow_frac = _banded_knn_pass(
                ref_pts, enc, query_pts[idx], float(cell), k)
            result[idx[done]] = winner[done]
            need[idx] = ~done
            if debug:
                print(f"[knn] round {rnd}: nq={len(idx)} cell={cell:.3f} "
                      f"done={done.mean():.3f} overflow={overflow_frac:.3f} "
                      f"{time.time()-t0:.2f}s", flush=True)
            if overflow_frac > 0.5 or done.mean() < 0.25:
                # cells so coarse that whole rows exceed the window (larger
                # cells only overflow harder), or a round that resolves
                # almost nothing: finish via brute force
                break
            cell *= 4.0

    if need.any():
        idx = np.where(need)[0]
        nn = None
        if len(idx) * max(nr, 1) > float(os.environ.get(
                "TL_KNN_KDTREE_MIN_PAIRS", 2e10)):
            # huge clumped backstops (offset-shifted canopies at plot scale):
            # the device brute pass measured 146 s for 1.46M x 1.1M where a
            # host KD-tree answers exactly in ~9 s — the same structure the
            # reference's KNeighborsClassifier uses (util/pipeline.py:292)
            try:
                from scipy.spatial import cKDTree

                _, nn = cKDTree(ref_pts).query(query_pts[idx], k=k,
                                               workers=-1)
                nn = nn.reshape(len(idx), k)
            except ImportError:  # pragma: no cover - scipy ships in-image
                nn = None
        if nn is None:
            nn = brute_knn(ref_pts, query_pts[idx], k=k)
        votes = np.sort(enc[nn], axis=1)
        counts = (votes[:, :, None] == votes[:, None, :]).sum(axis=2)
        result[idx] = np.take_along_axis(
            votes, counts.argmax(axis=1)[:, None], axis=1)[:, 0]

    return result + base - 1      # decode the >= 1 label shift
