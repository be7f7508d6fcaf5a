"""Geometric point features: verticality via neighborhood covariance.

TPU-native replacement for jakteristics' radius-search eigen-features
(reference: tree_learn/util/data_preparation.py:83-100 — only ``verticality``
with search_radius 0.6 is used).  Definition (jakteristics/CloudCompare):
verticality = 1 - |n_z| where n is the unit eigenvector of the *smallest*
eigenvalue of the neighborhood covariance (the surface normal).  Vertical
surfaces (trunks) -> ~1, horizontal ground -> ~0.

Device algorithm: bucket points into xy cells of ``search_radius``; per point,
gather capped candidates from the 3x3 cell neighborhood across a z-window,
exact-radius mask, accumulate 3x3 covariance moments, and solve the symmetric
eigenproblem in closed form (trigonometric method) on the VPU.  Points with
fewer than 3 neighbors get NaN, then NaNs are replaced by the column mean
(parity: replace_nanfeatures, data_preparation.py:91-100).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import SENTINEL


def smallest_eigvec_sym3(cov: jnp.ndarray):
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3)
    matrices, closed form (suited to the VPU: no iteration, no branching)."""
    a = cov
    q = jnp.trace(a, axis1=-2, axis2=-1) / 3.0
    a_q = a - q[..., None, None] * jnp.eye(3, dtype=a.dtype)
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    b = a_q / p[..., None, None]
    detb = jnp.linalg.det(b) / 2.0
    detb = jnp.clip(detb, -1.0, 1.0)
    phi = jnp.arccos(detb) / 3.0
    # eigenvalues: q + 2p cos(phi + 2k pi / 3); smallest at k=1 shift
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector via cross products of rows of (A - eig_min I)
    m = a - eig_min[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.maximum(n, 1e-20)


def verticality_from_cov6(xx, xy, xz, yy, yz, zz):
    """|z| of the smallest-eigenvalue eigenvector of symmetric 3x3 matrices
    given as six (N,) component columns — the same closed form as
    :func:`smallest_eigvec_sym3` but fully columnar.

    TPU layout note: a (N, 3, 3) tensor is tiled T(8,128) on TPU — the two
    minor dims pad 3->8 and 3->128, a ~114x physical inflation.  Keeping the
    covariance as six (N,) columns keeps every buffer's minor dimension large.
    """
    q = (xx + yy + zz) / 3.0
    axx, ayy, azz = xx - q, yy - q, zz - q
    p2 = (axx * axx + ayy * ayy + azz * azz
          + 2.0 * (xy * xy + xz * xz + yz * yz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    bxx, byy, bzz = axx / p, ayy / p, azz / p
    bxy, bxz, byz = xy / p, xz / p, yz / p
    detb = (bxx * (byy * bzz - byz * byz)
            - bxy * (bxy * bzz - byz * bxz)
            + bxz * (bxy * byz - byy * bxz)) / 2.0
    detb = jnp.clip(detb, -1.0, 1.0)
    phi = jnp.arccos(detb) / 3.0
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector via cross products of rows of (A - eig_min I), componentwise
    mxx, myy, mzz = xx - eig_min, yy - eig_min, zz - eig_min
    # rows: r0 = (mxx, xy, xz), r1 = (xy, myy, yz), r2 = (xz, yz, mzz)
    crosses = []
    for (a0, a1, a2), (b0, b1, b2) in (
            ((mxx, xy, xz), (xy, myy, yz)),   # r0 x r1
            ((mxx, xy, xz), (xz, yz, mzz)),   # r0 x r2
            ((xy, myy, yz), (xz, yz, mzz))):  # r1 x r2
        cx = a1 * b2 - a2 * b1
        cy = a2 * b0 - a0 * b2
        cz = a0 * b1 - a1 * b0
        crosses.append((cx, cy, cz, cx * cx + cy * cy + cz * cz))
    n0, n1, n2 = crosses[0][3], crosses[1][3], crosses[2][3]
    best01_z = jnp.where(n0 >= n1, crosses[0][2], crosses[1][2])
    best01_n = jnp.maximum(n0, n1)
    best_z = jnp.where(best01_n >= n2, best01_z, crosses[2][2])
    best_n = jnp.maximum(best01_n, n2)
    return jnp.abs(best_z) / jnp.sqrt(jnp.maximum(best_n, 1e-40))


@partial(jax.jit, static_argnames=("cell_cap",))
def _verticality_pass(ref_pts, ref_valid, query_pts, query_valid, radius,
                      cell_cap: int):
    """One capped neighborhood pass of a query block against the full ref set.
    Returns (verticality, n_neighbors) per query.

    Structure tuned to the TPU memory system:
    * one broadcast (Q, cap) gather per neighbor cell and coordinate -- 27 big
      gathers total, never per-rank scalar gathers (op count) and never
      (Q, cap, 3) tensors (the 3-wide minor dim would be tile-padded to 128);
    * per-cell strided sampling over the whole cell occupancy, so dense cells
      contribute an evenly spread subset instead of their first rows;
    * covariance kept as six scalar columns through the closed-form
      eigensolver (verticality_from_cov6).
    """
    nr = ref_pts.shape[0]
    cell = radius
    ij_r = jnp.floor(ref_pts[:, :2] / cell).astype(jnp.int64)
    mins = jnp.min(jnp.where(ref_valid[:, None], ij_r,
                             jnp.iinfo(jnp.int32).max), axis=0)
    keys_r = (ij_r - mins).astype(jnp.int32)
    width = jnp.int32(30000)
    keys = jnp.where(ref_valid, keys_r[:, 0] * width + keys_r[:, 1], SENTINEL)

    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sx = ref_pts[:, 0][order]
    sy = ref_pts[:, 1][order]
    sz = ref_pts[:, 2][order]

    qij = (jnp.floor(query_pts[:, :2] / cell).astype(jnp.int64)
           - mins).astype(jnp.int32)
    px, py, pz = query_pts[:, 0], query_pts[:, 1], query_pts[:, 2]

    r2 = radius * radius
    r_arr = jnp.arange(cell_cap, dtype=jnp.int32)
    nq = query_pts.shape[0]
    zeros = jnp.zeros((nq,), jnp.float32)
    cnt, m1x, m1y, m1z = zeros, zeros, zeros, zeros
    mxx, mxy, mxz, myy, myz, mzz = (zeros,) * 6

    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            nbr_key = (qij[:, 0] + di) * width + (qij[:, 1] + dj)
            key_ok = query_valid & jnp.all(
                (qij + jnp.array([di, dj])) >= 0, axis=1)
            nbr_key = jnp.where(key_ok, nbr_key, SENTINEL)
            start = jnp.searchsorted(sorted_keys, nbr_key,
                                     side="left").astype(jnp.int32)
            end = jnp.searchsorted(sorted_keys, nbr_key,
                                   side="right").astype(jnp.int32)
            length = end - start
            offs = jnp.where(length[:, None] > cell_cap,
                             (r_arr[None, :] * length[:, None]) // cell_cap,
                             r_arr[None, :])
            idx = jnp.clip(start[:, None] + offs, 0, nr - 1)  # (Q, cap)
            ok = (sorted_keys[idx] == nbr_key[:, None]) & key_ok[:, None]
            qx, qy, qz = sx[idx], sy[idx], sz[idx]            # (Q, cap)
            d2 = (jnp.square(qx - px[:, None]) + jnp.square(qy - py[:, None])
                  + jnp.square(qz - pz[:, None]))
            w = (ok & (d2 <= r2)).astype(jnp.float32)
            cnt = cnt + w.sum(1)
            m1x = m1x + (w * qx).sum(1)
            m1y = m1y + (w * qy).sum(1)
            m1z = m1z + (w * qz).sum(1)
            mxx = mxx + (w * qx * qx).sum(1)
            mxy = mxy + (w * qx * qy).sum(1)
            mxz = mxz + (w * qx * qz).sum(1)
            myy = myy + (w * qy * qy).sum(1)
            myz = myz + (w * qy * qz).sum(1)
            mzz = mzz + (w * qz * qz).sum(1)

    c = jnp.maximum(cnt, 1.0)
    ex, ey, ez = m1x / c, m1y / c, m1z / c
    cov_xx = mxx / c - ex * ex
    cov_xy = mxy / c - ex * ey
    cov_xz = mxz / c - ex * ez
    cov_yy = myy / c - ey * ey
    cov_yz = myz / c - ey * ez
    cov_zz = mzz / c - ez * ez
    nz = verticality_from_cov6(cov_xx, cov_xy, cov_xz, cov_yy, cov_yz, cov_zz)
    vert = 1.0 - nz
    vert = jnp.where((cnt >= 3) & query_valid, vert, jnp.nan)
    return vert, cnt


def compute_verticality(points: np.ndarray, search_radius: float = 0.6,
                        cell_cap: int = 128, chunk: int = 1 << 18,
                        query_idx: np.ndarray = None,
                        **kwargs) -> np.ndarray:
    """Host wrapper: pads refs to a power-of-two bucket, runs the device pass
    over query blocks (bounded memory at any cloud size), replaces NaN with
    the column mean.  Returns (N, 1) f32 — or (len(query_idx), 1) when
    ``query_idx`` selects a query subset (neighborhoods always come from the
    FULL cloud; used by the deferred-verticality path that only evaluates the
    grouping filter's candidate points).

    Note: on dense voxelized clouds (0.1 m) an xy cell of 0.6 m holds up to
    ~2000 voxels; ``cell_cap`` caps the neighbors actually accumulated via an
    evenly strided per-cell sample -- verticality is thresholded downstream
    (tau_vert 0.6, grouping.yaml:4) and is insensitive to it.
    """
    points = np.asarray(points, np.float32)
    n = len(points)
    queries = points if query_idx is None else points[np.asarray(query_idx)]
    nq = len(queries)
    vert = np.empty(nq, np.float32)

    # banded Pallas kernel (exact, gather-free; ops/pallas_vert.py) on TPU,
    # XLA capped-gather pass elsewhere and for window-overflow stragglers
    use_banded = kwargs.get("use_banded")
    if use_banded is None:
        use_banded = jax.default_backend() == "tpu"
    need = np.ones(nq, bool)
    dev_refs = None
    if use_banded and nq:
        from .pallas_vert import verticality_banded

        v_b, cnt_b, overflow, dev_refs = verticality_banded(
            points, queries, float(search_radius), return_device_refs=True)
        done = ~overflow
        vert[done] = np.where(cnt_b[done] >= 3, v_b[done], np.nan)
        need = overflow

    if need.any():
        if dev_refs is not None:
            # reuse the banded pass's device-resident sorted ref cloud
            # (order is irrelevant: _verticality_pass sorts by its own keys)
            ref_j, n_ref = dev_refs
            size = ref_j.shape[0]
            rv_j = jnp.arange(size, dtype=jnp.int32) < n_ref
        else:
            size = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
            pts = np.zeros((size, 3), np.float32)
            pts[:n] = points
            vmask = np.zeros(size, bool)
            vmask[:n] = True
            ref_j, rv_j = jnp.asarray(pts), jnp.asarray(vmask)
        rem = np.where(need)[0]
        # block size follows the actual straggler count (pow-2 bucketed so a
        # handful of banded-overflow queries costs a ~1k pass, not a full
        # 256k one — the XLA gather pass scales linearly in query rows)
        qb = min(chunk, size,
                 1 << max(int(np.ceil(np.log2(max(len(rem), 1)))), 10))
        for lo in range(0, len(rem), qb):
            hi = min(lo + qb, len(rem))
            blk = np.zeros((qb, 3), np.float32)
            blk[: hi - lo] = queries[rem[lo:hi]]
            qv = np.zeros(qb, bool)
            qv[: hi - lo] = True
            v, _ = _verticality_pass(ref_j, rv_j, jnp.asarray(blk),
                                     jnp.asarray(qv),
                                     np.float32(search_radius), cell_cap)
            vert[rem[lo:hi]] = np.asarray(v)[: hi - lo]

    nanmask = np.isnan(vert)
    if nanmask.any():
        mean = np.nanmean(vert) if not np.isnan(vert).all() else 0.0
        vert = np.where(nanmask, mean, vert)
    return vert.astype(np.float32)[:, None]
