"""bench.py evidence-hygiene gate (VERDICT r10 #1): a non-idle machine
is a refusal, not a warning — no artifact, non-zero exit."""

import pytest

import bench


def test_refuses_when_load_never_drops(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as e:
        bench.wait_for_idle(timeout_sec=0.05, poll_sec=0.01)
    assert e.value.code == 2


def test_waits_through_transient_load(monkeypatch):
    loads = iter([(5.0,) * 3, (3.0,) * 3, (0.4,) * 3])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_idle(timeout_sec=60, poll_sec=0) == 0.4


def test_idle_machine_passes_immediately(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.3, 0.4))

    def no_sleep(_):  # pragma: no cover - must never be reached
        raise AssertionError("idle gate slept on an idle machine")

    monkeypatch.setattr(bench.time, "sleep", no_sleep)
    assert bench.wait_for_idle() == 0.2


def test_force_env_overrides_with_flagged_run(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # returns (no exit) but the returned load keeps load_warning true
    assert bench.wait_for_idle(timeout_sec=0.05, poll_sec=0.01) == 9.9
