"""Two REAL jax.distributed processes exercise parallel/multihost.py's
multi-process branches (VERDICT #8: those branches had never executed).

Spawns 2 subprocesses (each with 2 virtual CPU devices) wired through a
local coordinator; the worker (multihost_worker.py) runs union_vocab,
make_global_arrays, and a cross-process psum'd cofactor aggregation and
checks them against full-data ground truth."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cpu():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
