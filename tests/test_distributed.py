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


def _run_two_process(timeout_s: int):
    """One attempt: spawn both workers, return (ok, detail)."""
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
            out, _ = p.communicate(timeout=timeout_s)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return False, "2-process selftest timed out:\n" + "\n---\n".join(outs)
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            return False, f"process {i} failed:\n{out}"
        if "SELFTEST_OK" not in out:
            return False, f"process {i} missing OK marker:\n{out}"
    # both processes must agree on the psum'd loss
    losses = sorted(
        line.split("loss=")[1].split()[0]
        for out in outs
        for line in out.splitlines()
        if "SELFTEST_OK" in line
    )
    if losses[0] != losses[-1]:
        return False, f"loss diverged across processes: {losses}"
    return True, ""


def test_two_process_cpu_mesh():
    """Two attempts before failing: each worker cold-compiles (this host's
    CPU AOT cache rejects its own entries — see the verify skill's
    compile-cache notes), so under transient host contention one attempt can
    blow the wall-clock budget without any code being wrong (the round-2/3
    flake).  A real regression — crash, missing marker, loss divergence, or
    a genuine hang — still fails both attempts."""
    ok, detail = _run_two_process(timeout_s=600)
    if not ok:
        ok, detail = _run_two_process(timeout_s=900)
    if not ok:
        pytest.fail(detail)
