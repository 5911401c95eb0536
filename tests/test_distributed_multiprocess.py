"""Real two-process jax.distributed correctness test (VERDICT round-1 #6).

Spawns 2 OS processes (CPU backend, process 0 as coordinator) running
tests/distributed_worker.py and asserts the cross-process contracts the
single-process suite cannot reach:

  * reduce_clip_val_collective: global min/max for minmax, process-mean
    for hist/mse (reference utils.py:331-344 semantics over DCN
    collectives instead of rank files);
  * _barrier (multihost sync_global_devices);
  * reduce_profiling_res rank-file merge: mean of avg-cosines, min of
    min-cosines (reference utils.py:386-412)."""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_collective_reduce_and_barrier(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # workers manage their own backend; drop any test-session forcing
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(port), str(i), str(tmp_path)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers hung:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    result = json.load(open(tmp_path / "result.json"))
    # rank0: a=[-1,2] b=[0.5,4]; rank1: a=[-2,3] b=[1,3]
    assert result["mm"]["a"] == [-2.0, 3.0]
    assert result["mm"]["b"] == [0.5, 4.0]
    assert result["hist"]["a"] == [-1.5, 2.5]
    assert result["hist"]["b"] == [0.75, 3.5]
    # layer cosine: mean(0.9, 0.95); model: [mean(0.8, 0.9), min(0.7, 0.5)]
    assert abs(result["layer"]["n1"] - 0.925) < 1e-12
    assert abs(result["model"]["out"][0] - 0.85) < 1e-12
    assert abs(result["model"]["out"][1] - 0.5) < 1e-12
