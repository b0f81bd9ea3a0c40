"""bench.py orchestrator rc semantics (VERDICT r4 item 1c).

The driver's official BENCH artifact must be diagnosable from rc alone:
  0 = bench ran
  2 = kernel hang/crash with a RESPONSIVE device (twice)
  3 = device/tunnel unresponsive (probe backoff exhausted) — infra
These tests drive `orchestrate()` with a mocked `_child` so no device
is touched.
"""
import importlib.util
import os
import sys

import pytest


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def bench(monkeypatch):
    mod = _load_bench()
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _script(bench, monkeypatch, results):
    """Feed _child a scripted list of (mode, rc) expectations."""
    calls = []

    def fake_child(mode, timeout):
        calls.append(mode)
        assert results, f"unexpected extra call: {mode}"
        want_mode, rc = results.pop(0)
        assert mode == want_mode, (mode, want_mode)
        return rc

    monkeypatch.setattr(bench, "_child", fake_child)
    return calls


def test_all_green(bench, monkeypatch):
    _script(bench, monkeypatch, [("probe", 0), ("run", 0)])
    assert bench.orchestrate() == 0


def test_probe_backoff_recovers(bench, monkeypatch):
    """A transient tunnel outage (observed: minutes-long after idle)
    must be ridden out by the backoff, not declared infra-dead."""
    _script(bench, monkeypatch,
            [("probe", 124), ("probe", 124), ("probe", 0), ("run", 0)])
    assert bench.orchestrate() == 0


def test_probe_exhausted_is_rc3(bench, monkeypatch):
    _script(bench, monkeypatch, [("probe", 124)] * 4)
    assert bench.orchestrate() == 3


def test_run_fail_dead_device_is_rc3(bench, monkeypatch):
    """Bench died AND the device no longer answers: infra, not code."""
    _script(bench, monkeypatch,
            [("probe", 0), ("run", 124)] + [("probe", 124)] * 4)
    assert bench.orchestrate() == 3


def test_run_fail_twice_alive_device_is_rc2(bench, monkeypatch):
    """Bench failed twice while a trivial dispatch works: kernel bug."""
    _script(bench, monkeypatch,
            [("probe", 0), ("run", 124), ("probe", 0), ("run", 124)])
    assert bench.orchestrate() == 2


def test_run_retry_recovers(bench, monkeypatch):
    _script(bench, monkeypatch,
            [("probe", 0), ("run", 1), ("probe", 0), ("run", 0)])
    assert bench.orchestrate() == 0
