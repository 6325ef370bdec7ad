"""Watchdog orchestration of bench.py's measurement stages.

The driver runs ``bench.py`` at round end and must always get one JSON
line; when the TPU relay is hard-down both TPU attempts stall and the
watchdog falls back to a hermetic-CPU degraded measurement. These tests
pin the orchestration (attempt order, env scrubbing, output parsing,
failure attribution) with a stubbed child process — the real CPU stage
is exercised by running ``bench.py --stage jax --general-path``.
"""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
import bench  # noqa: E402
from multivae_tpu.utils.hermetic import AXON_TRIGGER_VARS  # noqa: E402

pytestmark = pytest.mark.driver  # bench orchestration contract


class _Proc:
    def __init__(self, stdout, returncode=0, stderr=""):
        self.stdout = stdout
        self.returncode = returncode
        self.stderr = stderr


def test_fallback_to_cpu_after_tpu_stalls(monkeypatch):
    calls = []

    def fake_run(cmd, capture_output, text, timeout, env=None):
        calls.append((cmd, timeout, env))
        if len(calls) <= 2:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _Proc(json.dumps({"train_sps": 280.0,
                                 "avatars_per_sec": 2.7e5,
                                 "moe_sps": None}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert (payload["train_sps"], payload["avatars_per_sec"],
            payload["moe_sps"], payload["backend"]) == (
        280.0, 2.7e5, None, "cpu-fallback")
    assert len(failures) == 2 and all("stalled" in f for f in failures)
    assert len(calls) == 3
    # TPU attempts inherit the parent env (env=None); the fallback scrubs
    # the axon trigger vars and pins the CPU platform
    assert calls[0][2] is None and calls[1][2] is None
    cpu_env = calls[2][2]
    assert cpu_env["JAX_PLATFORMS"] == "cpu"
    for var in AXON_TRIGGER_VARS:
        assert var not in cpu_env
    assert "--general-path" in calls[2][0]
    assert calls[0][1] == bench.TPU_WATCHDOG_CAPS[0]
    assert calls[2][1] == bench.CPU_WATCHDOG_CAP


def test_first_tpu_attempt_wins(monkeypatch):
    def fake_run(cmd, capture_output, text, timeout, env=None):
        return _Proc("stray line\n" + json.dumps(
            {"train_sps": 65000.0, "avatars_per_sec": 1.8e6,
             "moe_sps": 62000.0, "platform": "tpu",
             "train_windows": [44000.0, 65000.0]}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert failures == []
    assert payload["backend"] == "tpu"
    assert payload["train_sps"] == 65000.0
    assert payload["train_windows"] == [44000.0, 65000.0]


def test_platform_mismatch_is_relabeled(monkeypatch):
    """A nominally-TPU child that self-reports the CPU platform must be
    labeled 'cpu' (honest labeling), with the mismatch recorded."""
    def fake_run(cmd, capture_output, text, timeout, env=None):
        return _Proc(json.dumps(
            {"train_sps": 300.0, "avatars_per_sec": 1.0e5,
             "moe_sps": None, "platform": "cpu"}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert payload["backend"] == "cpu"
    assert len(failures) == 1 and "self-reported" in failures[0]


def test_legacy_child_without_platform_keeps_nominal_label(monkeypatch):
    def fake_run(cmd, capture_output, text, timeout, env=None):
        return _Proc(json.dumps(
            {"train_sps": 60000.0, "avatars_per_sec": 1.0e6,
             "moe_sps": None}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert payload["backend"] == "tpu" and failures == []


def test_all_attempts_stall_returns_failures(monkeypatch):
    def fake_run(cmd, capture_output, text, timeout, env=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    res, failures = bench._run_jax_stage_watchdogged()
    assert res is None
    assert len(failures) == 3


def test_child_error_recorded_with_stderr_tail(monkeypatch, capsys):
    """A TPU-path code regression (child exits nonzero) must be attributed
    as an ERROR — not silently folded into the relay-outage story."""
    seen = []

    def fake_run(cmd, capture_output, text, timeout, env=None):
        seen.append(cmd)
        if len(seen) < 3:
            return _Proc("", returncode=1,
                         stderr="Traceback ...\nValueError: kernel broke")
        return _Proc(json.dumps({"train_sps": 1.0, "avatars_per_sec": 2.0,
                                 "moe_sps": None}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert payload["backend"] == "cpu-fallback"
    assert (payload["train_sps"], payload["avatars_per_sec"]) == (1.0, 2.0)
    assert len(failures) == 2
    assert all("rc=1" in f and "kernel broke" in f for f in failures)
    # the child's stderr tail is surfaced on the parent's stderr too
    assert "kernel broke" in capsys.readouterr().err


def test_timeout_partial_stderr_is_kept(monkeypatch):
    """A hanging child's captured stderr is evidence (a deadlocked code
    bug looks like a stall); the failure entry must carry its tail."""
    def fake_run(cmd, capture_output, text, timeout, env=None):
        if "--general-path" not in cmd:
            exc = subprocess.TimeoutExpired(cmd, timeout)
            exc.stderr = "connecting to relay...\nRuntimeError: wedged"
            raise exc
        return _Proc(json.dumps({"train_sps": 1.0, "avatars_per_sec": 2.0,
                                 "moe_sps": None}) + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    payload, failures = bench._run_jax_stage_watchdogged()
    assert payload["backend"] == "cpu-fallback"
    assert all("partial stderr" in f and "wedged" in f for f in failures)


def _main_result(monkeypatch, capsys, payload, failures=()):
    monkeypatch.setattr(bench, "bench_torch", lambda: 73.0)
    monkeypatch.setattr(bench, "_run_jax_stage_watchdogged",
                        lambda: (payload, list(failures)))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_main_reports_windows_and_spread(monkeypatch, capsys):
    res = _main_result(monkeypatch, capsys, {
        "train_sps": 62000.0, "avatars_per_sec": 1.5e6, "moe_sps": None,
        "platform": "tpu", "backend": "tpu",
        "train_windows": [31000.0, 62000.0]})
    assert res["value"] == 62000.0
    assert res["train_windows"] == [31000.0, 62000.0]
    assert res["window_spread"] == 0.5
    assert "contended" not in res


def test_main_flags_contended_run(monkeypatch, capsys):
    """Every window below 85% of the quiet capability => the JSON line
    carries an explicit contention flag, so a low recorded number is
    attributed to the shared relay pool, not the kernel."""
    res = _main_result(monkeypatch, capsys, {
        "train_sps": 30000.0, "avatars_per_sec": 1.0e6, "moe_sps": None,
        "platform": "tpu", "backend": "tpu",
        "train_windows": [28000.0, 30000.0, 29000.0]})
    assert res["contended"] is True
    assert "quiet-window capability" in res["contention_note"]


def test_quiet_threshold_sourced_from_artifacts(tmp_path, monkeypatch):
    """The contention threshold tracks the recorded baseline (best on-TPU
    BENCH_r*.json headline, env-overridable) instead of a hard-coded
    historical constant that would mislabel runs if kernel capability
    legitimately changes."""
    monkeypatch.setenv("MULTIVAE_QUIET_SPS", "12345")
    assert bench._quiet_train_sps() == 12345.0
    monkeypatch.delenv("MULTIVAE_QUIET_SPS")

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    # no artifacts at all: historical floor
    assert bench._quiet_train_sps() == bench._QUIET_SPS_FALLBACK
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"parsed": {
        "metric": "mopoe_train_steps_per_sec", "value": 70000.0}}))
    # degraded rounds are excluded — they measure the fallback path
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": {
        "metric": "mopoe_train_steps_per_sec", "value": 99999.0,
        "backend": "cpu-fallback", "note": "degraded"}}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"parsed": {
        "metric": "mopoe_train_steps_per_sec", "value": 0.0,
        "error": "every attempt failed"}}))
    (tmp_path / "BENCH_r04.json").write_text("not json")
    assert bench._quiet_train_sps() == 70000.0


def test_main_notes_platform_mismatch(monkeypatch, capsys):
    res = _main_result(monkeypatch, capsys, {
        "train_sps": 290.0, "avatars_per_sec": 9.0e4, "moe_sps": None,
        "platform": "cpu", "backend": "cpu",
        "train_windows": [290.0]},
        failures=["tpu attempt 1: child self-reported platform='cpu'; "
                  "result labeled accordingly"])
    assert res["backend"] == "cpu"
    assert "platform mismatch" in res["note"]
    assert "contended" not in res  # only TPU numbers get the flag
