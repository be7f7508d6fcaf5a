"""The shared window/caps selection formulas (pipeline/windows.py) — one
copy used by run.py, bench decompose, the inference bump retry, and the A/B
probes.  Values pinned from the 968k-pt bench plot (437740 voxels, cap 2^19,
depth 7) so a policy change is a conscious diff here, not silent drift."""

import numpy as np

from treelearn_tpu.pipeline.windows import (WINDOW_LADDER, bump_windows,
                                            pow2, select_level_caps,
                                            select_level_windows)


def test_bench_plot_values_pinned():
    counts = [437740, 230000, 58000, 14000, 3500, 900, 300]
    caps = select_level_caps(counts, 524288)
    assert caps == (524288, 262144, 65536, 16384, 4096, 1024, 512)
    req = [590, 416, 305, 291, 265, 264, 144]
    wins = select_level_windows(req, caps)
    assert wins == (640, 512, 512, 512, 512, 512, 512)
    assert bump_windows(wins, caps, 524288) == (768, 640, 640, 640, 640,
                                                640, 512)


def test_window_respects_capacity_and_slack():
    # plot-scale level (cap >= 2^21) takes 128 slack; small levels take 16
    assert select_level_windows([500], [1 << 22]) == (640,)   # 500+128 -> 640
    assert select_level_windows([500], [1 << 20]) == (640,)   # 500+16 -> 640
    assert select_level_windows([490], [1 << 20]) == (512,)   # 490+16 -> 512
    # never exceeds the level capacity
    assert select_level_windows([5000], [2048]) == (2048,)
    # past the ladder top: ceil to the next 128 multiple
    top = WINDOW_LADDER[-1]
    (w,) = select_level_windows([top + 100], [1 << 22])
    assert w == ((top + 100 + 128 + 127) // 128) * 128


def test_bump_doubles_past_ladder_top():
    top = WINDOW_LADDER[-1]
    assert bump_windows((top,), None, 1 << 22) == (2 * top,)
    assert bump_windows((512,), None, 1 << 22) == (640,)
    # capped by level capacity when provided
    assert bump_windows((512,), (512,), 1 << 22) == (512,)


def test_pow2():
    assert [pow2(x) for x in (1, 2, 3, 437740)] == [1, 2, 4, 524288]
