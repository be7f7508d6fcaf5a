"""Per-level capacity / conv-window selection shared by the production
pipeline (run.py), the bench's model-step decomposition, the inference
window-bump retry, and the A/B probes — ONE copy of the formulas so a policy
change cannot leave a measurement harness silently measuring a stale ladder
(ADVICE r5).

Windows bucket to a small ladder so similar plots share compiled programs;
the device's spans-ok flag still gates exactness at runtime, so a window only
needs to be PROBABLY right — a rare miss re-runs through the window-bump
retry (pipeline/inference.py) at small-compile cost.
"""

from __future__ import annotations

import numpy as np

WINDOW_LADDER = (512, 640, 768, 1024, 1536, 2048, 3072, 4096)


def pow2(x) -> int:
    return 1 << int(np.ceil(np.log2(max(int(x), 1))))


def select_level_caps(level_counts, voxel_capacity: int):
    """Measured per-level capacities: exact active-voxel counts bucketed to
    pow2 with 2% headroom (the host mirrors the device's float32 grid math,
    but fused XLA rounding may differ on boundary points); level 0 is always
    the full voxel capacity."""
    caps = tuple(min(max(pow2(int(c * 1.02)), 512), int(voxel_capacity))
                 for c in level_counts)
    return (int(voxel_capacity),) + caps[1:]


def select_level_windows(required, level_caps, ladder=WINDOW_LADDER):
    """Slack policy: small levels keep it tight (16: a few boundary voxels of
    host/device f32 drift); plot-scale levels (cap >= 2^21) take the full 128
    alignment-flip slack — their retry compile is ~a minute and worth
    avoiding.  Capped at the level capacity (the conv requires window <= V).
    """
    return tuple(
        min(next((c for c in ladder
                  if c >= r + (128 if cp >= (1 << 21) else 16)),
                 ((r + 128 + 127) // 128) * 128), int(cp))
        for r, cp in zip(required, level_caps))


def bump_windows(level_windows, level_caps, voxel_capacity: int,
                 ladder=WINDOW_LADDER):
    """One ladder step up per level (doubling past the ladder top), capped at
    the level capacity — the window-bump retry program."""
    return tuple(
        min(next((c for c in ladder if c > w), w * 2),
            (level_caps[i] if level_caps is not None else voxel_capacity))
        for i, w in enumerate(level_windows))
