"""Driver-proofing contract for bench.py (VERDICT r3 #1, r4 #1): a hung,
crashed, or driver-killed attempt must never lose an already-measured
number. BENCH_r03.json was rc=1 because one subprocess.TimeoutExpired
propagated; BENCH_r04.json was rc=124/parsed=null because the parent only
printed JSON after ALL attempts — attempt 1's 6104.5 faces/s was measured
and then lost when attempt 2 wedged and the driver's outer timeout fired.
The round-5 contract: best-so-far JSON is printed IMMEDIATELY after every
successful attempt, a global wall-clock budget skips attempts that cannot
fit, and a relay-recovery sleep separates ALL attempts (successes too)."""

import json
import subprocess

import pytest

import bench


class _FakeProc:
    def __init__(self, stdout="", stderr="", returncode=0):
        self.stdout, self.stderr, self.returncode = stdout, stderr, returncode


def _result(value: float) -> str:
    return json.dumps({
        "metric": "faces/sec/chip", "value": value, "unit": "faces/sec",
        "vs_baseline": round(value / 33.3, 1), "detail": {},
    })


def test_timeout_attempt_is_caught_and_next_attempt_runs(monkeypatch, capsys):
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 900),
                                            output="", stderr="[bench] hung")
        return _FakeProc(stdout="noise\n" + _result(5000.0 + calls["n"]))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)  # relay backoff
    bench.main_with_retries(max_attempts=3)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    got = json.loads(out)
    assert got["value"] == 5003.0  # best of the two successful attempts
    assert got["detail"]["attempts_planned"] == 3
    assert got["detail"]["attempts_succeeded"] == 2
    assert got["detail"]["median_faces_per_sec_across_attempts"] == 5002.5


def test_all_attempts_run_no_early_exit(monkeypatch, capsys):
    """The reported median must be a real >=3-attempt median — no
    good-enough early exit (VERDICT r3 weak #7)."""
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        return _FakeProc(stdout=_result(9000.0))  # instantly "good enough"

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main_with_retries(max_attempts=3)
    assert calls["n"] == 3
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["detail"]["attempts_succeeded"] == 3


def test_empty_stdout_attempt_is_skipped(monkeypatch, capsys):
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] < 3:
            return _FakeProc(stdout="", stderr="crash", returncode=1)
        return _FakeProc(stdout=_result(4321.0))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench.main_with_retries(max_attempts=3)
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 4321.0
    assert got["detail"]["attempts_succeeded"] == 1


def test_all_attempts_failing_exits_nonzero(monkeypatch):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, 900)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench.main_with_retries(max_attempts=2)


def test_json_survives_driver_kill_after_first_success(monkeypatch, capsys):
    """THE round-4 failure, pinned: attempt 1 measures a number, then the
    process dies mid-attempt-2 (simulated with a BaseException the retry
    loop does not catch). The attempt-1 JSON must ALREADY be on stdout."""
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return _FakeProc(stdout=_result(6104.5))
        raise KeyboardInterrupt("driver outer timeout / SIGKILL stand-in")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(KeyboardInterrupt):
        bench.main_with_retries(max_attempts=3)
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines, "best-so-far JSON must be printed right after attempt 1"
    got = json.loads(lines[-1])
    assert got["value"] == 6104.5
    assert got["detail"]["attempts_succeeded"] == 1


def test_global_budget_skips_unaffordable_attempt(monkeypatch, capsys):
    """With one result in hand and not enough budget left for
    recovery+timeout of another attempt, the loop must stop — round 4's
    900s+90s+900s attempt chain could never fit any plausible driver
    timeout. A *zero*-result state must still keep trying (a late number
    beats a guaranteed nothing)."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_TOTAL_BUDGET_S", "1200")
    monkeypatch.setenv("BENCH_ATTEMPT_TIMEOUT", "420")
    monkeypatch.setenv("BENCH_RECOVERY_SLEEP_S", "45")
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        clock["t"] += 400.0  # each attempt consumes 400s of wall clock
        return _FakeProc(stdout=_result(6000.0 + calls["n"]))

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench.main_with_retries(max_attempts=5)
    # t=0: attempt 1 (ends 400); t=400: 400+45+420<=1200 -> attempt 2 (ends
    # 800); t=800: 800+45+420>1200 -> stop. Exactly 2 attempts.
    assert calls["n"] == 2
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["value"] == 6002.0
    assert got["detail"]["attempts_succeeded"] == 2


def test_child_budget_derived_from_attempt_timeout(monkeypatch):
    """The child's internal BENCH_BUDGET_S must leave margin inside the
    parent's per-attempt timeout so partial JSON lands before the kill."""
    seen_env = {}

    def fake_run(cmd, **kw):
        seen_env.update(kw.get("env") or {})
        return _FakeProc(stdout=_result(1000.0))

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.delenv("BENCH_BUDGET_S", raising=False)
    monkeypatch.setenv("BENCH_FIRST_ATTEMPT_TIMEOUT", "600")
    bench.main_with_retries(max_attempts=1)
    assert float(seen_env["BENCH_BUDGET_S"]) <= 600 - 60
