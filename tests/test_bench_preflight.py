"""bench.py's tunnel preflight: fail fast, never hang the driver."""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_preflight():
    """Extract _preflight from bench.py without executing the module
    (importing bench.py would run the preflight and configure jax)."""
    src = open(os.path.join(HERE, "bench.py")).read()
    start = src.index("def _preflight")
    end = src.index("\n_preflight()", start)
    ns = {"sys": sys, "os": os}
    exec(compile(src[start:end], "bench.py", "exec"), ns)
    return ns["_preflight"]


def test_preflight_skips_pure_cpu(monkeypatch):
    """JAX_PLATFORMS=cpu without the axon plugin never probes."""
    pre = _load_preflight()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", "/root/repo")

    import socket as socket_mod

    def boom(*a, **k):
        raise AssertionError("preflight probed on a pure-CPU run")

    monkeypatch.setattr(socket_mod, "socket", boom)
    pre()                                   # returns without probing


def test_preflight_exits_2_on_dead_relay(monkeypatch):
    """A refused relay port is a fast exit-2 with a one-line diagnosis,
    not a hang."""
    pre = _load_preflight()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site")

    import socket as socket_mod

    class Refuse:
        def settimeout(self, t):
            pass

        def connect(self, addr):
            raise OSError(111, "Connection refused")

        def close(self):
            pass

    monkeypatch.setattr(socket_mod, "socket", lambda *a, **k: Refuse())
    with pytest.raises(SystemExit) as e:
        pre()
    assert e.value.code == 2
