"""bench.py robustness (VERDICT r2 weak #1): backend-init retry with backoff,
structured JSON on terminal failure, watchdog — the round-2 driver record was
a raw traceback from a dead tunnel; these guards make every outcome parseable."""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_init_retry_recovers_after_transient_failure(bench, monkeypatch):
    calls = {"n": 0}

    def flaky_devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon'")
        return ["fake-device"]

    monkeypatch.setattr(bench.jax, "devices", flaky_devices)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "5")
    monkeypatch.setenv("BENCH_INIT_BACKOFF", "0.01")
    assert bench._init_devices_with_retry() == ["fake-device"]
    assert calls["n"] == 3


def test_init_retry_raises_after_exhaustion(bench, monkeypatch):
    def dead_devices():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench.jax, "devices", dead_devices)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "2")
    monkeypatch.setenv("BENCH_INIT_BACKOFF", "0.01")
    with pytest.raises(RuntimeError, match="axon"):
        bench._init_devices_with_retry()


def test_fail_prints_one_parseable_json_line(bench, capsys):
    with pytest.raises(SystemExit) as exc:
        try:
            raise RuntimeError("tunnel down")
        except RuntimeError as e:
            bench._fail("backend_init", e)
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["stage"] == "backend_init"
    assert "tunnel down" in rec["error"]
    assert rec["value"] is None


def test_main_emits_structured_json_when_init_dead(bench, monkeypatch, capsys):
    def dead_devices():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench.jax, "devices", dead_devices)
    monkeypatch.setenv("BENCH_INIT_RETRIES", "2")
    monkeypatch.setenv("BENCH_INIT_BACKOFF", "0.01")
    monkeypatch.setenv("BENCH_WATCHDOG", "0")
    with pytest.raises(SystemExit):
        bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "backend_init"
    assert "axon" in rec["error"]
