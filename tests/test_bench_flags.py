"""Regression-flag logic of bench.py (pure functions — no Spark).

The round-5 failure mode this pins: a bursty co-tenant load mid-run
inflated 10 queries past the 1.5x bar while the START/END calibration
pair — both taken on a quiet host — explained none of it. With
interleaved samples, a burst that inflates a query inflates its
NEAREST sample identically, so the normalized check stays quiet; a
genuine plan regression inflates the query but NOT the sample, so the
flag still fires.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

CAL_BASE = 1.68  # representative anchor value (the tests are pure
# functions of their inputs; the live anchor lives in
# BENCH_BASELINE.json and is re-frozen per baseline refresh)


def test_uniform_burst_produces_no_false_flag():
    """Host 2.4x slower for the whole window around a query: the query
    runs 2.4x over baseline AND the nearest sample reads 2.4x — the
    normalized flag must stay quiet."""
    burst = 2.4
    cal_start = CAL_BASE * burst
    sample0 = 0.21 * burst
    sample_near = 0.21 * burst
    r = bench.host_ratio(sample_near, sample0, cal_start, CAL_BASE)
    assert abs(r - burst) < 1e-9
    baseline_s = 2.76  # pipeline_span_clean, the round-5 watch item
    measured = baseline_s * burst * 1.1  # 10% noise on top of the burst
    assert not bench.is_flagged(measured, baseline_s, r)


def test_mid_run_burst_without_interleaving_would_misfire():
    """The exact round-5 shape: quiet start/end (anchor ratio ~1) but a
    2x burst mid-run. The run-wide ratio flags the query (the old
    behavior); the nearest-sample ratio does not."""
    cal_start = CAL_BASE  # quiet at start
    sample0 = 0.21
    samples = [(0, 0.21), (14, 0.21), (29, 0.42), (44, 0.21)]
    baseline_s = 2.0
    measured = 4.1  # 2x burst + noise, at query position 30
    # old behavior: ratio from the quiet anchor alone -> false flag
    r_anchor_only = bench.host_ratio(None, None, cal_start, CAL_BASE)
    assert bench.is_flagged(measured, baseline_s, r_anchor_only)
    # new behavior: position-30 query normalizes by the (29, 0.42)
    # sample -> no flag
    near = bench.nearest_sample(samples, 30)
    assert near == 0.42
    r = bench.host_ratio(near, sample0, cal_start, CAL_BASE)
    assert not bench.is_flagged(measured, baseline_s, r)


def test_genuine_plan_regression_still_fires_under_load():
    """A 3x plan regression on a host that is ALSO 1.5x loaded: the
    sample explains the 1.5x, not the 3x — flag fires."""
    load = 1.5
    cal_start = CAL_BASE * load
    sample0 = 0.21 * load
    sample_near = 0.21 * load
    r = bench.host_ratio(sample_near, sample0, cal_start, CAL_BASE)
    baseline_s = 2.0
    measured = baseline_s * load * 3.0
    assert bench.is_flagged(measured, baseline_s, r)


def test_faster_host_never_tightens_the_bar():
    r = bench.host_ratio(0.1, 0.21, CAL_BASE * 0.5, CAL_BASE)
    assert r == 1.0


def test_absolute_floor_spares_subsecond_noise():
    """Sub-second flicker (0.4 -> 1.1 s — measured on quiet hosts with
    host_ratio 1.0) stays under the 1.0 s materiality floor; a real
    blow-up of the same tiny query (0.4 -> 3 s, the lost-broadcast
    scale) still fires."""
    assert not bench.is_flagged(1.1, 0.4, 1.0)
    assert not bench.is_flagged(1.187, 0.512, 1.0)  # the bm25 flicker
    assert bench.is_flagged(3.0, 0.4, 1.0)


def test_nearest_sample_selection_and_degraded_modes():
    samples = [(0, 0.2), (14, 0.25), (29, 0.3)]
    assert bench.nearest_sample(samples, 5) == 0.2
    assert bench.nearest_sample(samples, 13) == 0.25
    assert bench.nearest_sample(samples, 100) == 0.3
    assert bench.nearest_sample([], 5) is None
    # no baseline at all -> ratio 1.0; no samples -> anchor-only ratio
    assert bench.host_ratio(None, None, None, None) == 1.0
    assert bench.host_ratio(None, None, 3.36, CAL_BASE) == 2.0


# ---------------------------------------------------------------------------
# Re-freeze audit trail (tools/freeze_baseline.py): the freeze-diff
# artifact must exist for any round that re-froze the baseline, and no
# flagged mover may land unexplained (VERDICT r8 #2 — two mid-round
# re-freezes re-measured old queries with no audit trail).
# ---------------------------------------------------------------------------

REPO = os.path.dirname(os.path.dirname(__file__))

fb_spec = importlib.util.spec_from_file_location(
    "freeze_baseline", os.path.join(REPO, "tools", "freeze_baseline.py")
)
fb = importlib.util.module_from_spec(fb_spec)
fb_spec.loader.exec_module(fb)


def test_freeze_diff_normalizes_host_speed():
    """A uniformly 2x slower host at re-freeze must flag nothing; a
    genuine 2x single-query regression on the SAME host speed must."""
    old = {"calibration_s": 1.5, "queries": {"q1": 2.0, "q2": 0.1}}
    # host 2x slower: calibration AND every query double
    new_uniform = {"calibration_s": 3.0, "queries": {"q1": 4.0, "q2": 0.2}}
    d = fb.freeze_diff(old, new_uniform)
    assert d["flagged"] == []
    assert d["rows"]["q1"]["ratio_calibrated"] == 1.0
    # same host, q1 genuinely 2x slower
    new_reg = {"calibration_s": 1.5, "queries": {"q1": 4.0, "q2": 0.1}}
    d2 = fb.freeze_diff(old, new_reg)
    assert [f["query"] for f in d2["flagged"]] == ["q1"]
    assert d2["rows"]["q1"]["ratio_calibrated"] == 2.0


def test_freeze_diff_floor_and_membership():
    """Sub-floor micro rows never flag however big the ratio; added and
    removed queries are recorded, not diffed."""
    old = {"calibration_s": 1.0, "queries": {"tiny": 0.05, "gone": 1.0}}
    new = {"calibration_s": 1.0, "queries": {"tiny": 0.25, "fresh": 1.0}}
    d = fb.freeze_diff(old, new)
    assert d["flagged"] == []  # 5x ratio but below the 0.3 s floor
    assert d["added"] == ["fresh"]
    assert d["removed"] == ["gone"]
    assert "gone" not in d["rows"] and "fresh" not in d["rows"]


def test_committed_freeze_diffs_have_no_unexplained_movers():
    """Every committed BASELINE_DIFF_r*.json must carry an empty
    flagged list or a nonempty 'explanation' on each flagged row —
    the gate that stops a regression from being absorbed into a
    re-frozen baseline."""
    import glob
    import json

    for path in sorted(glob.glob(os.path.join(REPO, "BASELINE_DIFF_r*.json"))):
        with open(path) as f:
            diff = json.load(f)
        for row in diff.get("flagged", []):
            assert row.get("explanation"), (
                f"{os.path.basename(path)}: flagged mover "
                f"{row.get('query')} has no explanation — investigate "
                f"the regression or annotate why it is expected"
            )


def test_current_round_tracks_correctness_artifacts(tmp_path):
    assert fb.current_round(str(tmp_path)) == 1
    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r11.json").write_text("{}")
    assert fb.current_round(str(tmp_path)) == 12


def test_rotation_window_cycles_and_avoids_slowest_set():
    """VERDICT r9 #7: successive rounds' stdout lines must carry
    different extra queries (so BENCH_r artifacts cycle through the
    whole benched set) and never duplicate the slowest-N entries."""
    names = [f"q{i:03d}" for i in range(219)]
    exclude = set(names[:25])
    windows = [bench.rotation_window(names, exclude, r) for r in (9, 10, 11)]
    for w in windows:
        assert len(w) == bench.ROTATE_N
        assert not (set(w) & exclude)
    assert len({frozenset(w) for w in windows}) == 3
    # a full cycle visits every non-excluded name (offsets step the
    # FULL list now, so a cycle is len(names)/ROTATE_N rounds)
    seen = set()
    for r in range(len(names) // bench.ROTATE_N + 2):
        seen.update(bench.rotation_window(names, exclude, r))
    assert seen == set(names) - exclude


def test_rotation_window_stable_under_exclude_churn():
    """ADVICE/VERDICT r10 #7 follow-up: the slowest-N exclude set is
    run-dependent, so the window offset must anchor to the full
    registry order — otherwise consecutive rounds re-pick the same
    names whenever the pool shifts under the window (round 11's run
    re-picked 4 of round 10's 5)."""
    names = [f"q{i:03d}" for i in range(219)]
    ex10 = set(names[:25])
    ex11 = set(names[:20]) | {names[30], names[60], names[80]}
    w10 = bench.rotation_window(names, ex10, 10)
    w11 = bench.rotation_window(names, ex11, 11)
    assert w10 == names[50:55]
    assert w11 == names[55:60]
    assert not (set(w10) & set(w11))


def test_refreeze_never_overwrites_a_diff_artifact(tmp_path):
    """ADVICE r9: two freezes in the same round must each keep their
    own old->new diff — the second gets a sequence suffix instead of
    clobbering the first (the audit trail VERDICT r8 #2 created)."""
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    first = fb.next_diff_path(str(tmp_path))
    assert first.endswith("BASELINE_DIFF_r10.json")
    open(first, "w").write("{}")
    second = fb.next_diff_path(str(tmp_path))
    assert second.endswith("BASELINE_DIFF_r10.2.json")
    open(second, "w").write("{}")
    assert fb.next_diff_path(str(tmp_path)).endswith(
        "BASELINE_DIFF_r10.3.json"
    )
