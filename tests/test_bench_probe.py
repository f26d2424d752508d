"""bench.py's backend-init hardening is a driver artifact contract: a
wedged axon transport must become bounded retries then a clean raise
(rc=1 with the real error), never an uninterruptible hang (the round-3/4
rc=124 signature).  The hang lives inside jax.devices() holding the GIL,
so the first handshake is taken in a killable subprocess."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_probe_skipped_on_explicit_cpu(monkeypatch):
    # explicit CPU run (local testing): no transport to wedge, no probe
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a))
    bench._probe_backend_subprocess()
    assert calls == []


def test_probe_converts_hang_into_clean_raise(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    attempts = []

    def fake_run(cmd, timeout=None, **kw):
        attempts.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr("time.sleep", lambda s: None)
    try:
        bench._probe_backend_subprocess(max_tries=3, timeout=1.0,
                                        base_sleep=0.0)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "wedged transport" in str(e)
    assert attempts == [1.0, 1.0, 1.0]


def test_probe_returns_on_child_success(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")

    class Res:
        returncode = 0
        stdout = "probe devices: [TpuDevice(id=0)]"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Res())
    bench._probe_backend_subprocess(max_tries=1, timeout=5.0)


def test_probe_cpu_fallback_counts_as_failure(monkeypatch):
    # 'axon,cpu' silently falling back to CPU must NOT look healthy
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")

    class Res:
        returncode = 2
        stdout = "probe devices: [CpuDevice(id=0)]"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Res())
    monkeypatch.setattr("time.sleep", lambda s: None)
    try:
        bench._probe_backend_subprocess(max_tries=2, timeout=5.0,
                                        base_sleep=0.0)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "rc=2" in str(e)
