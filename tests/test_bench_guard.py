"""bench.py evidence-hygiene gates.

Round 13 semantics (VERDICT r12 #1): thresholds scale with the core
count, a merely-non-idle machine runs WITH load_warning instead of
refusing (only a half-busy one still refuses), mid-bench cooldowns
draw from one shared budget, and a SIGTERM snapshot line makes the
artifact undroppable under a driver timeout.
"""

import json

import pytest

import bench


def test_thresholds_scale_with_cores():
    # 15 % / 20 % / 25 % / 50 % of cores, floored at the old absolutes
    assert bench.IDLE_LOAD1M == max(1.0, 0.15 * bench.NCPU)
    assert bench.STORM_LOAD1M == max(1.5, 0.20 * bench.NCPU)
    assert bench.IDLE_LOAD5M == max(2.5, 0.25 * bench.NCPU)
    assert bench.REFUSE_LOAD1M == max(4.0, 0.5 * bench.NCPU)


def test_storm_threshold_constants_are_sane():
    # the per-row stamp threshold must sit between the idle gates so a
    # row can be stormy without the whole session having been refused;
    # the refusal line must sit above everything (warn-zone exists)
    assert bench.IDLE_LOAD1M < bench.STORM_LOAD1M < bench.IDLE_LOAD5M
    assert bench.IDLE_LOAD5M <= bench.REFUSE_LOAD1M


def test_ambient_sandbox_load_passes_the_start_gate():
    # the r12 failure shape: this sandbox idles at load1m ~2.2, which
    # the absolute 1.0 gate could never pass on a 32-core box
    if bench.NCPU >= 16:
        assert 2.2 < bench.IDLE_LOAD1M


def test_refuses_only_when_half_the_cores_are_busy(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    monkeypatch.setattr(bench, "REFUSE_LOAD1M", 8.0)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as e:
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=0.05, poll_sec=0.01
        )
    assert e.value.code == 2


def test_merely_busy_machine_proceeds_with_warning(monkeypatch):
    # VERDICT r12 #1: between IDLE and REFUSE, an expired wait now
    # returns (artifact carries load_warning=true) instead of zeroing
    # the round's evidence with a refusal
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    monkeypatch.setattr(bench, "REFUSE_LOAD1M", 16.0)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert (
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=0.05, poll_sec=0.01
        )
        == 9.9
    )


def test_waits_through_transient_load(monkeypatch):
    loads = iter([(5.0,) * 3, (3.0,) * 3, (0.4,) * 3])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert (
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=60, poll_sec=0
        )
        == 0.4
    )


def test_idle_machine_passes_immediately(monkeypatch):
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.2, 0.3, 0.4))

    def no_sleep(_):  # pragma: no cover - must never be reached
        raise AssertionError("idle gate slept on an idle machine")

    monkeypatch.setattr(bench.time, "sleep", no_sleep)
    assert bench.wait_for_idle(threshold=1.0, threshold5m=2.5) == 0.2


def test_force_env_overrides_with_flagged_run(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    monkeypatch.setattr(bench, "REFUSE_LOAD1M", 8.0)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # returns (no exit) even above REFUSE; load_warning stays true
    assert (
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=0.05, poll_sec=0.01
        )
        == 9.9
    )


# --- round 12: load5m gate (VERDICT r11 #1a) -------------------------
# r11's driver artifact walked through the load1m-only gate at 0.86
# while load5m/15m sat at 8.6/9.6 — a machine minutes out of a storm.


def test_waits_through_decaying_storm_until_load5m_cools(monkeypatch):
    loads = iter([(0.9, 8.6, 9.6), (0.8, 4.1, 8.0), (0.4, 1.2, 4.0)])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # load15m stays high but is NOT gated (it decays too slowly to
    # require — a 15-minute-old storm with cool 1m/5m is safe to time)
    assert (
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=60, poll_sec=0
        )
        == 0.4
    )


def test_decaying_storm_never_cooling_runs_flagged_not_refused(monkeypatch):
    # r13 semantics: load1m well under REFUSE, load5m stuck high — the
    # expired wait proceeds (flagged) rather than dropping the round
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    monkeypatch.setattr(bench, "REFUSE_LOAD1M", 16.0)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.86, 8.63, 9.57))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert (
        bench.wait_for_idle(
            threshold=1.0, threshold5m=2.5, timeout_sec=0.05, poll_sec=0.01
        )
        == 0.86
    )


# --- round 13: shared mid-bench cooldown budget (VERDICT r12 #1b) ----
# r12's per-trigger 120 s cooldowns had no global cap: ~30 stormy slope
# rows alone could burn an hour, and did — rc=124, zero parsed results.


def test_cooldown_draws_from_shared_budget(monkeypatch):
    monkeypatch.setattr(bench, "_cooldown_spent", 0.0)
    calls = []

    def fake_wait(timeout_sec, exit_on_busy):
        calls.append(timeout_sec)
        return 1.0

    monkeypatch.setattr(bench, "wait_for_idle", fake_wait)
    ticks = iter([0.0, 50.0, 50.0, 170.0])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(ticks))
    bench.cooldown(timeout_sec=120)
    assert bench._cooldown_spent == 50.0
    bench.cooldown(timeout_sec=500)
    assert bench._cooldown_spent == 170.0
    # first call capped by requested timeout, second by remaining budget
    assert calls[0] == 120
    assert calls[1] == bench.COOLDOWN_BUDGET_SEC - 50.0


def test_cooldown_budget_exhausted_never_sleeps(monkeypatch):
    monkeypatch.setattr(bench, "_cooldown_spent", bench.COOLDOWN_BUDGET_SEC)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (7.7, 7.7, 7.7))

    def no_wait(*a, **k):  # pragma: no cover - must never be reached
        raise AssertionError("cooldown waited past an exhausted budget")

    monkeypatch.setattr(bench, "wait_for_idle", no_wait)
    assert bench.cooldown(timeout_sec=120) == 7.7


def test_cooldown_budget_is_bounded():
    # the whole run may wait at most ~5 minutes, total
    assert bench.COOLDOWN_BUDGET_SEC <= 360


# --- round 13: SIGTERM snapshot (VERDICT r12 #1c) --------------------


def test_sigterm_handler_prints_snapshot_line(monkeypatch, capsys):
    line = json.dumps({"metric": "total_wall_sec", "partial": "queries"})
    monkeypatch.setitem(bench._SNAPSHOT, "line", line)
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    bench._emit_snapshot_and_exit(15, None)
    assert capsys.readouterr().out.strip() == line
    assert exited == [3]


def test_sigterm_handler_silent_without_snapshot(monkeypatch, capsys):
    monkeypatch.setitem(bench._SNAPSHOT, "line", None)
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    bench._emit_snapshot_and_exit(15, None)
    assert capsys.readouterr().out == ""
    assert exited == [3]
