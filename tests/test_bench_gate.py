"""Closing-artifact probe gate (bench.py, VERDICT r12 item 7): a run whose
full-run probe medians exceed ~15% over the settled reference must not
become the committed bench_result.json. Pure-logic tests -- no Spark."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import GATE_HEADROOM, gate_reference, probe_gate  # noqa: E402


def test_settled_run_passes():
    ok, checks = probe_gate(
        0.40, 0.92, {"sentinel_sec": 0.427, "job_overhead_sec": 0.927}
    )
    assert ok
    assert checks["sentinel_sec"]["ok"] and checks["job_overhead_sec"]["ok"]


def test_r12_degraded_run_is_refused():
    """The exact probe readings that poisoned BENCH_r12 (0.527/1.293 vs
    settled 0.427/0.927) must trip the gate."""
    ok, checks = probe_gate(
        0.527, 1.293, {"sentinel_sec": 0.427, "job_overhead_sec": 0.927}
    )
    assert not ok
    assert not checks["sentinel_sec"]["ok"]
    assert not checks["job_overhead_sec"]["ok"]


def test_single_probe_over_limit_refuses():
    """One settled probe does not excuse the other (r12's signature was
    job-overhead inflating while the scan sentinel held)."""
    ok, checks = probe_gate(
        0.40, 1.293, {"sentinel_sec": 0.427, "job_overhead_sec": 0.927}
    )
    assert not ok
    assert checks["sentinel_sec"]["ok"]
    assert not checks["job_overhead_sec"]["ok"]


def test_headroom_boundary():
    ref = {"sentinel_sec": 1.0, "job_overhead_sec": 1.0}
    ok, _ = probe_gate(GATE_HEADROOM - 1e-9, GATE_HEADROOM - 1e-9, ref)
    assert ok
    ok, _ = probe_gate(GATE_HEADROOM + 1e-6, 1.0, ref)
    assert not ok


def test_missing_reference_passes_vacuously():
    """First round on a new box: no settled values yet -> no gate."""
    ok, checks = probe_gate(5.0, 5.0, {})
    assert ok and checks == {}


def test_gate_reference_env_overrides_file(monkeypatch):
    """A build box with a different floor gates against its OWN settled
    values via env, without editing the committed driver-box file."""
    monkeypatch.setenv("SPARK_GRAFT_GATE_SENTINEL", "0.70")
    monkeypatch.setenv("SPARK_GRAFT_GATE_OVERHEAD", "1.50")
    ref = gate_reference()
    assert ref["sentinel_sec"] == 0.70
    assert ref["job_overhead_sec"] == 1.50


def test_committed_gate_file_is_the_driver_band():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_GATE.json",
    )
    with open(path) as f:
        ref = json.load(f)
    assert 0.3 < ref["sentinel_sec"] < 0.6
    assert 0.7 < ref["job_overhead_sec"] < 1.2


def test_mid_run_load_window_refuses():
    """ADVICE r13: endpoint medians settled, but one interleaved reading
    shows a mid-run load window past TRACK_HEADROOM -> artifact refused."""
    from bench import TRACK_HEADROOM

    ref = {"sentinel_sec": 0.427, "job_overhead_sec": 0.927}
    ok, checks = probe_gate(
        0.40, 0.92, ref, sentinel_track_vals=[0.41, 0.427 * TRACK_HEADROOM * 1.5, 0.43]
    )
    assert not ok
    assert not checks["sentinel_track_max"]["ok"]
    assert checks["sentinel_sec"]["ok"]  # endpoints alone would have passed


def test_interleaved_noise_under_track_headroom_passes():
    """A single interleaved trial is noisy; readings inside 2x settled
    must not refuse an otherwise settled run."""
    ref = {"sentinel_sec": 0.427, "job_overhead_sec": 0.927}
    ok, checks = probe_gate(
        0.40, 0.92, ref, sentinel_track_vals=[0.41, 0.70, 0.43]
    )
    assert ok
    assert checks["sentinel_track_max"]["ok"]


def _bench_artifact(sentinel, overhead, queries, jobs=None):
    d = {
        "sentinel_sec": sentinel,
        "job_overhead_sec": overhead,
        "queries": queries,
    }
    if jobs is not None:
        d["jobs"] = jobs
    return d


def test_ratio_compare_job_normalization_clears_overhead_inflation():
    """VERDICT r13 item 1: a job-count-heavy row whose wall tracks the
    box's per-job latency (overhead probe 1.0 -> 3.0 s) must NOT read as
    a regression once job-normalized, while a same-jobs row whose
    compute genuinely doubled still does."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from bench_ratio_compare import compare

    # old box: per_job = 1.0/20 = 0.05s. graph row: 200 jobs -> 10s of
    # overhead + 2s compute. new box: per_job = 3.0/20 = 0.15s -> 30s
    # overhead + 2s compute = 32s wall: raw ratio-of-ratios 2.7x
    # (sentinel flat), adj ratio ~1.0.
    old = _bench_artifact(
        0.4, 1.0, {"graph": 12.0, "scan": 2.0}, {"graph": 200.0, "scan": 4.0}
    )
    new = _bench_artifact(
        0.4, 3.0, {"graph": 32.0, "scan": 5.0}, {"graph": 200.0, "scan": 4.0}
    )
    rows = {r[0]: r for r in compare(old, new, flag=2.0)}
    graph = rows["graph"]
    assert graph[3] >= 2.0  # raw rr flags it
    assert 0.8 <= graph[6] <= 1.3  # adj_rr clears it
    assert graph[8] != "REGRESSED"
    # scan: 4 jobs, overhead negligible; wall 2.0 -> 5.0 with per-job
    # latency explaining < 0.5s of it -> real regression
    scan = rows["scan"]
    assert scan[6] >= 2.0
    assert scan[8] == "REGRESSED"


def test_ratio_compare_pure_overhead_row_marked_not_regressed():
    """A row whose entire wall is scheduling latency (adjusted wall
    clamps at the floor) carries no code signal -> '~overhead'."""
    from bench_ratio_compare import compare

    old = _bench_artifact(0.4, 1.0, {"drain": 5.0}, {"drain": 100.0})
    new = _bench_artifact(0.4, 3.0, {"drain": 15.0}, {"drain": 100.0})
    (row,) = compare(old, new, flag=2.0)
    assert row[7] is True  # clamped
    assert row[8] == "~overhead"


def test_ratio_compare_pre_r14_artifacts_fall_back_to_raw_ratio():
    from bench_ratio_compare import compare

    old = _bench_artifact(0.4, 1.0, {"q": 2.0})
    new = _bench_artifact(0.4, 1.0, {"q": 6.0})
    (row,) = compare(old, new, flag=2.0)
    assert row[6] is None  # no adj_rr without job counts
    assert row[8] == "REGRESSED"
