"""The bench contamination gate (VERDICT r4 "What's wrong" #1): both
degradation modes must flag the record — allocator pressure via the
numpy probe (threshold 100 ms; the r4 driver record started at 143 ms
and slipped under the old 150 ms gate) and the probe-invisible
"afternoon" whole-JVM slowdown via the pricing_summary control query.
Pure-logic tests; the end-to-end deliberately-loaded-run evidence is
BENCH/gate_selftest.json."""

import bench


def test_healthy_run_is_clean():
    f = bench.contamination_flags(32.0, 0.29, 0.1)
    assert f == {"probe_degraded": False, "jvm_degraded": False,
                 "contaminated": False}


def test_r4_driver_record_would_now_flag():
    # the round-4 driver record: probe 143.3 ms, shipped unflagged
    f = bench.contamination_flags(143.3, 0.29, 0.1)
    assert f["probe_degraded"] and f["contaminated"]


def test_afternoon_mode_flags_via_control_query():
    # healthy probe, but the stable-JVM control runs 2.7x slow
    # (documented mode: pricing_summary 0.27 -> 0.73 s warm at sf0.1)
    f = bench.contamination_flags(35.0, 0.73, 0.1)
    assert not f["probe_degraded"]
    assert f["jvm_degraded"] and f["contaminated"]


def test_sf001_control_range_applies():
    assert bench.contamination_flags(30.0, 0.80, 0.01)["contaminated"]
    assert not bench.contamination_flags(30.0, 0.20, 0.01)["contaminated"]


def test_unknown_sf_control_is_unknown_not_false():
    # no committed range at an uncalibrated SF: jvm_degraded is None
    # (unknown), never a silent False
    f = bench.contamination_flags(30.0, 5.0, 1.0)
    assert f["jvm_degraded"] is None and not f["contaminated"]


def test_missing_control_measurement_degrades_gracefully():
    f = bench.contamination_flags(30.0, None, 0.1)
    assert f["jvm_degraded"] is None and not f["contaminated"]


def test_both_signals_flag_together():
    f = bench.contamination_flags(500.0, 2.0, 0.1)
    assert f["probe_degraded"] and f["jvm_degraded"] and f["contaminated"]
