"""Multi-HOST mesh: two real processes, each owning 4 virtual devices,
jointly trace one global ray batch over the 8-device multihost mesh
(``make_multihost_mesh`` + ``multihost_trace_closest_hit``).

The comm-backend layer the reference lacks (SURVEY.md 2.23): process-group
init via jax.distributed, per-process local shards, bit-identical results
to the single-device kernel on every host.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_mesh_trace():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multiproc_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    # the axon sitecustomize registers its PJRT plugin at interpreter
    # start, which initializes the XLA backend BEFORE
    # jax.distributed.initialize can run — gate it off and go straight
    # to the CPU platform in the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(i), "2"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multiprocess workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, f"worker {i} no OK:\n{out}"
