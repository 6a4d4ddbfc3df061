"""2-process logical-mesh test: jax.distributed spanning two OS processes,
each with 4 virtual CPU devices, executing the sharded 4-step NTT bit-exactly
across the process boundary (the DCN story — SURVEY.md §5 "distributed
communication backend"; the reference is single-device,
/root/reference/engine_context.py:38)."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _proc_env(port: int, pid: int, nproc: int) -> dict:
    env = dict(os.environ)
    # clean slate: the parent conftest's CPU forcing must be re-applied in
    # the children, with 4 (not 8) virtual devices per process
    env.pop("AESFHE_PLATFORM", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["AESFHE_COORDINATOR"] = f"127.0.0.1:{port}"
    env["AESFHE_NUM_PROCESSES"] = str(nproc)
    env["AESFHE_PROCESS_ID"] = str(pid)
    return env


def test_two_process_sharded_ntt():
    port = _free_port()
    script = os.path.join(REPO, "scripts", "run_multihost.py")
    procs = [subprocess.Popen([sys.executable, script],
                              env=_proc_env(port, pid, 2),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost run timed out:\n" +
                    "\n".join(o or "" for o in outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"process failed:\n{out}"
        assert "MULTIHOST OK" in out, out
    assert "8 global devices" in outs[0]
    assert '"fwd_exact": true' in outs[0]
