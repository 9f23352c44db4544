"""Budget-aware bench.py orchestrator legs (VERDICT r4 item 1).

The orchestrator must capture the device wall through ONE transient
outage: first device attempt sized from the remaining budget, CPU
fallback when it fails, then a FULL wall retry once the probe recovers
(previously only the device-only encode figure was retried, leaving the
wall of record as the CPU fallback).  These tests fake the probe and the
subprocess legs to pin the control flow; the real measurement paths are
exercised by running bench.py itself.
"""

import importlib
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as mod
    importlib.reload(mod)
    yield mod


def _run(bench, monkeypatch, probe_results, leg_results, budget=580):
    """Drive main() with scripted probe verdicts + leg outcomes.

    probe_results: list of bools consumed per probe_backend call.
    leg_results: dict mode -> JSON dict or None (None = leg fails).
    Returns (printed JSON dict, list of legs attempted).
    """
    from ebcc_tpu.utils import health
    probes = iter(probe_results)
    monkeypatch.setattr(health, "probe_backend",
                        lambda use_cache=True, timeout_s=None: next(probes))
    monkeypatch.setattr(health, "write_verdict", lambda alive: None)
    legs = []

    def fake_run_mode(mode, timeout_s):
        legs.append((mode, timeout_s))
        out = leg_results.get(mode)
        if isinstance(out, list):  # per-call sequence
            return out.pop(0) if out else None
        return out

    monkeypatch.setattr(bench, "_run_mode", fake_run_mode)
    monkeypatch.setenv("EBCC_BENCH_BUDGET", str(budget))
    printed = []
    monkeypatch.setattr("builtins.print", lambda s: printed.append(s))
    rc = bench.main()
    assert rc == 0
    return json.loads(printed[-1]), legs


DEV = {"metric": "device", "value": 5.4e6, "vs_baseline": 2.7,
       "device_encode_pts_per_s": 5.0e7}
CPU = {"metric": "cpu fallback", "value": 4.2e6, "vs_baseline": 2.1,
       "device_encode_pts_per_s": 0.0}
DEVONLY = {"metric": "device-only", "value": 5.0e7, "vs_baseline": 25.0,
           "device_encode_pts_per_s": 5.0e7}


def test_healthy_tunnel_single_device_leg(bench, monkeypatch):
    out, legs = _run(bench, monkeypatch, [True], {"device": DEV})
    assert out["value"] == DEV["value"]
    assert [m for m, _ in legs] == ["device"]


def test_transient_outage_retries_full_wall(bench, monkeypatch):
    # probe ok -> device leg hangs/fails -> cpu -> probe ok -> FULL retry
    out, legs = _run(bench, monkeypatch, [True, True],
                     {"device": [None, DEV], "cpu": CPU})
    assert [m for m, _ in legs] == ["device", "cpu", "device"]
    assert out["value"] == DEV["value"]
    assert "retry" in out["metric"]  # labelled as a retry capture


def test_full_outage_reports_labelled_fallback(bench, monkeypatch):
    out, legs = _run(bench, monkeypatch, [False, False], {"cpu": CPU})
    assert [m for m, _ in legs] == ["cpu"]
    assert out["value"] == CPU["value"]


def test_late_recovery_records_device_only(bench, monkeypatch):
    # tunnel back too late for a full retry: budget only allows the
    # device-only encode figure, attached to the fallback wall
    out, legs = _run(bench, monkeypatch, [False, True],
                     {"cpu": CPU, "device": None, "device_only": DEVONLY},
                     budget=270)
    assert ("device_only" in [m for m, _ in legs] or
            out["value"] == CPU["value"])
    assert out["device_encode_pts_per_s"] in (0.0, 5.0e7)


def test_budget_caps_every_leg(bench, monkeypatch):
    _, legs = _run(bench, monkeypatch, [True, True],
                   {"device": [None, DEV], "cpu": CPU}, budget=580)
    for _, box in legs:
        assert box <= 580
