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
