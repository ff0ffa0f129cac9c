"""Window planner invariants at realistic and adversarial shapes."""

import numpy as np
import pytest

from seedvr2_tpu.models.dit.windows import (build_layer_plan,
                                            shifted_window_slices,
                                            window_slices)


@pytest.mark.parametrize("grid", [
    (2, 135, 240),   # 4K output latent post-patch (bench shape)
    (8, 68, 120),    # 1080p video
    (1, 3, 5),       # tiny image
    (5, 45, 80),     # exactly 720p-normalized
    (13, 17, 23),    # odd everything
])
@pytest.mark.parametrize("method", ["window", "shifted_window"])
def test_partition_covers_exactly(grid, method):
    plan = build_layer_plan(grid, (4, 3, 3), method)
    L = int(np.prod(grid))
    flat = np.concatenate([g.idx.reshape(-1) for g in plan.groups])
    assert sorted(flat.tolist()) == list(range(L))
    # inverse permutation round-trips
    x = np.arange(L)
    window_major = x[flat]
    np.testing.assert_array_equal(window_major[plan.inv], x)
    assert plan.num_windows == sum(g.idx.shape[0] for g in plan.groups)


def test_window_slices_match_reference_formula():
    """Spot-check against hand-computed reference values (window.py:28-49):
    for (t,h,w)=(2,135,240), scale=sqrt(3600/32400)=1/3 -> resized (45,80),
    window (15,27), temporal wt=ceil(min(2,30)/4)=1."""
    slices = window_slices((2, 135, 240), (4, 3, 3))
    hs = sorted({(s[1].start, s[1].stop) for s in slices})
    ws = sorted({(s[2].start, s[2].stop) for s in slices})
    assert hs == [(i * 15, min((i + 1) * 15, 135)) for i in range(9)]
    assert ws[0] == (0, 27) and ws[-1] == (216, 240)  # ragged last column
    ts = sorted({(s[0].start, s[0].stop) for s in slices})
    assert ts == [(0, 1), (1, 2)]


def test_shifted_windows_have_partial_edges():
    slices = shifted_window_slices((2, 135, 240), (4, 3, 3))
    hs = sorted({(s[1].start, s[1].stop) for s in slices})
    # first window is the half-window remainder
    assert hs[0][0] == 0 and hs[0][1] < 15
