"""Multi-process (DCN) path: 2-process CPU mesh via jax.distributed.

The reference has no distributed backend at all (SURVEY.md §5); this validates
the rebuild's `jax.distributed.initialize` entry end-to-end: two OS processes,
2 virtual CPU devices each, one (dp=4) global mesh, a sharded render whose
lane axis crosses the process boundary, and a train step whose gradient
allreduce rides the (simulated) DCN.
"""

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


def test_two_process_cpu_mesh():
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2 "
        "--xla_llvm_disable_expensive_passes=true",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "PYTHONPATH": REPO,
        # tiny scene; keep each process light on the shared 2-core host
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, ".jax_cache"),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tools", "dist_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=REPO,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process selftest timed out:\n" + "\n---\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "SELFTEST_OK" in out, f"process {i} missing OK marker:\n{out}"
    # both processes must agree on the psum'd loss
    losses = sorted(
        line.split("loss=")[1].split()[0]
        for out in outs
        for line in out.splitlines()
        if "SELFTEST_OK" in line
    )
    assert losses[0] == losses[-1], f"loss diverged across processes: {losses}"
