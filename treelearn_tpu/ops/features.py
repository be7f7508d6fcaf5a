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


@partial(jax.jit, static_argnames=("cell_cap",))
def _verticality_pass(points, valid, radius, cell_cap: int):
    """One capped neighborhood pass. Returns (verticality, n_neighbors)."""
    n = points.shape[0]
    cell = radius
    ij = jnp.floor(points[:, :2] / cell).astype(jnp.int64)
    mins = jnp.min(jnp.where(valid[:, None], ij, jnp.iinfo(jnp.int32).max), axis=0)
    ij = (ij - mins).astype(jnp.int32)
    width = jnp.int32(30000)
    keys = jnp.where(valid, ij[:, 0] * width + ij[:, 1], SENTINEL)

    order = jnp.argsort(keys, stable=True)
    sorted_keys = keys[order]
    sorted_pts = points[order]

    r2 = radius * radius
    # running covariance moments per point
    cnt = jnp.zeros((n,), jnp.float32)
    s1 = jnp.zeros((n, 3), jnp.float32)
    s2 = jnp.zeros((n, 3, 3), jnp.float32)

    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            nbr_key = jnp.where(valid, (ij[:, 0] + di) * width + (ij[:, 1] + dj),
                                SENTINEL)
            start = jnp.searchsorted(sorted_keys, nbr_key).astype(jnp.int32)

            def body(r, carry):
                cnt, s1, s2 = carry
                idx = jnp.clip(start + r, 0, n - 1)
                ok = (sorted_keys[idx] == nbr_key) & valid
                q = sorted_pts[idx]
                d2 = jnp.sum(jnp.square(q - points), axis=1)
                w = (ok & (d2 <= r2)).astype(jnp.float32)
                cnt = cnt + w
                s1 = s1 + w[:, None] * q
                s2 = s2 + w[:, None, None] * (q[:, :, None] * q[:, None, :])
                return cnt, s1, s2

            cnt, s1, s2 = jax.lax.fori_loop(0, cell_cap, body, (cnt, s1, s2))

    mean = s1 / jnp.maximum(cnt, 1.0)[:, None]
    cov = s2 / jnp.maximum(cnt, 1.0)[:, None, None] - mean[:, :, None] * mean[:, None, :]
    normal = smallest_eigvec_sym3(cov)
    vert = 1.0 - jnp.abs(normal[:, 2])
    vert = jnp.where((cnt >= 3) & valid, vert, jnp.nan)
    return vert, cnt


def compute_verticality(points: np.ndarray, search_radius: float = 0.6,
                        cell_cap: int = 128, chunk: int = 1 << 19,
                        **kwargs) -> np.ndarray:
    """Host wrapper: pads to buckets, runs the device pass (chunking the query
    side for memory), replaces NaN with the column mean.  Returns (N, 1) f32.

    Note: on dense voxelized clouds (0.1 m) an xy cell of 0.6 m holds up to
    ~2000 voxels; ``cell_cap`` caps the neighbors actually accumulated, a
    principled subsample — verticality is thresholded downstream (tau_vert
    0.6, grouping.yaml:4) and is insensitive to it.
    """
    points = np.asarray(points, np.float32)
    n = len(points)
    size = 1 << max(int(np.ceil(np.log2(max(n, 1024)))), 10)
    pts = np.zeros((size, 3), np.float32)
    pts[:n] = points
    vmask = np.zeros(size, bool)
    vmask[:n] = True

    vert, _ = _verticality_pass(jnp.asarray(pts), jnp.asarray(vmask),
                                np.float32(search_radius), cell_cap)
    vert = np.asarray(vert)[:n]

    nanmask = np.isnan(vert)
    if nanmask.any():
        mean = np.nanmean(vert) if not np.isnan(vert).all() else 0.0
        vert = np.where(nanmask, mean, vert)
    return vert.astype(np.float32)[:, None]
