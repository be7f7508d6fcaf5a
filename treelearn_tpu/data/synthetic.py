"""Procedural synthetic forests for tests and benchmarks.

The reference has no test data generator (its QA is the L1W benchmark, which
needs a 9 GB download).  We generate labeled cone-crown trees on undulating
terrain so every stage — training, tiling, inference, clustering, evaluation —
can be exercised hermetically, and the benchmark harness can scale point counts
arbitrarily.
"""

from __future__ import annotations

import numpy as np


def make_synthetic_forest(
    n_trees: int = 25,
    extent: float = 40.0,
    points_per_tree: int = 3000,
    ground_points: int = 20000,
    trunk_height_range=(4.0, 12.0),
    crown_radius_range=(0.8, 2.2),
    seed: int = 0,
    min_spacing: float = 2.5,
):
    """Returns (data (N, 4) [x, y, z, instance], tree_positions (n_trees, 2)).

    Labels follow the raw-data convention (reference data_preparation.py:11-12):
    0 = non-tree (ground), 1..n = tree instances.
    """
    rng = np.random.default_rng(seed)

    # poisson-ish tree placement with minimum spacing
    positions = []
    tries = 0
    while len(positions) < n_trees and tries < 10000:
        cand = rng.uniform(min_spacing, extent - min_spacing, 2)
        if all(np.linalg.norm(cand - p) >= min_spacing for p in positions):
            positions.append(cand)
        tries += 1
    positions = np.array(positions)
    n_trees = len(positions)

    def ground_z(xy):
        return 0.3 * np.sin(xy[:, 0] * 0.15) + 0.2 * np.cos(xy[:, 1] * 0.2)

    clouds, labels = [], []

    # ground
    gxy = rng.uniform(0, extent, (ground_points, 2))
    gz = ground_z(gxy) + rng.normal(0, 0.03, ground_points)
    clouds.append(np.column_stack([gxy, gz]))
    labels.append(np.zeros(ground_points, np.int64))

    for t in range(n_trees):
        height = rng.uniform(*trunk_height_range)
        crown_r = rng.uniform(*crown_radius_range)
        base = np.array([*positions[t], ground_z(positions[t][None])[0]])

        n_trunk = points_per_tree // 3
        n_crown = points_per_tree - n_trunk

        z_trunk = rng.uniform(0, height * 0.6, n_trunk)
        r_trunk = rng.uniform(0, 0.12, n_trunk)
        theta = rng.uniform(0, 2 * np.pi, n_trunk)
        trunk = base + np.column_stack(
            [r_trunk * np.cos(theta), r_trunk * np.sin(theta), z_trunk])

        z_crown = rng.uniform(height * 0.3, height, n_crown)
        taper = 1.0 - (z_crown - height * 0.3) / (height * 0.7)
        r_crown = rng.uniform(0, 1, n_crown) ** 0.5 * crown_r * np.maximum(taper, 0.1)
        theta = rng.uniform(0, 2 * np.pi, n_crown)
        crown = base + np.column_stack(
            [r_crown * np.cos(theta), r_crown * np.sin(theta), z_crown])

        clouds.append(np.vstack([trunk, crown]))
        labels.append(np.full(points_per_tree, t + 1, np.int64))

    data = np.column_stack([np.vstack(clouds), np.concatenate(labels)])
    return data.astype(np.float64), positions


def verticality_proxy(data: np.ndarray) -> np.ndarray:
    """Cheap stand-in verticality feature for synthetic fixtures: trunk-like
    points get high verticality, ground low (used where the real geometric
    feature kernel would run)."""
    labels = data[:, 3]
    vert = np.where(labels > 0, 0.85, 0.1)
    return vert.astype(np.float32)[:, None]


def make_crop_npz(path: str, data: np.ndarray, feats: np.ndarray,
                  center=(0.0, 0.0, 0.0)):
    """Write a crop/tile npz in the sample-generator artifact format."""
    np.savez(
        path,
        points=data[:, :3].astype(np.float32),
        feat=feats.astype(np.float32),
        instance_label=data[:, 3].astype(np.int32),
        center=np.asarray(center, np.float64),
    )
