"""Host-side dp-wave orchestration cost stays negligible (VERDICT r3 #5).

Measured on the virtual 8-device CPU mesh (tools/wave_overhead.py): at a
realistic wave size the runner's orchestration (shape grouping, stack,
dp device_put, result scatter) is within timer noise of pure compute
(~0% of a 14 s wave; docs/performance.md). This test bounds the ABSOLUTE
orchestration seconds at a small wave size so CI stays fast and the
bound can't be satisfied by just making compute big."""

from tools.wave_overhead import measure


def test_wave_orchestration_overhead_bounded():
    r = measure(reps=3, lt=2, lh=6, lw=8)
    assert r["devices"] == 8
    # pure-python grouping + stack + device_put + scatter of 8 tiny items:
    # measured ~5-30 ms; 0.4 s is a 10x+ margin that still catches a
    # host-side sync or per-item device round-trip sneaking into the loop
    # (those cost whole compute-waves, >1 s even at this size).
    assert r["orchestration_s"] < 0.4, r
    # and it must not scale with compute: the fraction of even this tiny
    # wave stays below half
    assert r["orchestration_frac"] < 0.5, r
