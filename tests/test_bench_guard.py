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


# --- round 12: load5m gate (VERDICT r11 #1a) -------------------------
# r11's driver artifact walked through the load1m-only gate at 0.86
# while load5m/15m sat at 8.6/9.6 — a machine minutes out of a storm.


def test_refuses_decaying_storm_low_load1m_high_load5m(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    # exactly the r11 failure shape: load1m idle, load5m stormy
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.86, 8.63, 9.57))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as e:
        bench.wait_for_idle(timeout_sec=0.05, poll_sec=0.01)
    assert e.value.code == 2


def test_waits_through_decaying_storm_until_load5m_cools(monkeypatch):
    loads = iter([(0.9, 8.6, 9.6), (0.8, 4.1, 8.0), (0.4, 1.2, 4.0)])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # load15m stays high but is NOT gated (it decays too slowly to
    # require — a 15-minute-old storm with cool 1m/5m is safe to time)
    assert bench.wait_for_idle(timeout_sec=60, poll_sec=0) == 0.4


def test_idle_both_windows_passes_immediately(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.9, 3.0))

    def no_sleep(_):  # pragma: no cover - must never be reached
        raise AssertionError("idle gate slept on an idle machine")

    monkeypatch.setattr(bench.time, "sleep", no_sleep)
    assert bench.wait_for_idle() == 0.2


def test_storm_threshold_constants_are_sane():
    # the per-row stamp threshold must sit between the idle gates so a
    # row can be stormy without the whole session having been refused
    assert bench.IDLE_LOAD1M < bench.STORM_LOAD1M < bench.IDLE_LOAD5M
