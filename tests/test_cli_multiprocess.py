"""Full-CLI two-process data-parallel run (reference DP contract e2e).

Launches `python -m dipoorlet_tpu --slurm` twice with emulated SLURM env
vars (the same launcher contract as the reference's dist_helper.py:26-49),
so jax.distributed auto-detects a 2-process cluster on the CPU backend.
Each process calibrates its own sample shard (shard_bounds), the clip
values merge over collectives, and rank 0 writes the artifacts.

Asserts the merged minmax ranges are bit-identical to a single-process
run over the full dataset — the rank-identical invariant the reference
states at weight_trans_base.py:16-18."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    import torch
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from torch_export import MODEL_ZOO, export
    from dipoorlet_tpu.runtime.data import make_synthetic_dataset
    base = tmp_path_factory.mktemp("cli_mp")
    torch.manual_seed(0)
    m = MODEL_ZOO["convnet"]() if "convnet" in MODEL_ZOO else MODEL_ZOO["resnet18"](num_classes=10)
    m.eval()
    model_path = str(base / "model.onnx")
    export(m, torch.randn(1, 3, 32, 32), model_path)
    data_dir = str(base / "data")
    make_synthetic_dataset(data_dir, {"input": [1, 3, 32, 32]}, 8, seed=11)
    return base, model_path, data_dir


def _run_cli(model_path, data_dir, out_dir, extra, env_extra=None, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    cmd = [sys.executable, "-m", "dipoorlet_tpu", "-M", model_path, "-I", data_dir,
           "-O", str(out_dir), "-N", "8", "-A", "minmax", "-D", "trt",
           "--batch_size", "4", "--cpu"] + extra
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_two_process_cli_matches_single_process(workload, tmp_path):
    base, model_path, data_dir = workload
    # single-process reference run
    out_single = tmp_path / "single"
    p = _run_cli(model_path, data_dir, out_single, [])
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out

    # two-process run via emulated SLURM launch (one shard of 4 samples each)
    out_multi = tmp_path / "multi"
    job_id = str(10000 + os.getpid() % 1000)  # port = jobid % 2^12 + 61440
    procs = []
    for rank in range(2):
        procs.append(_run_cli(model_path, data_dir, out_multi, ["--slurm"], {
            "SLURM_JOB_ID": job_id,
            "SLURM_STEP_NODELIST": "localhost",
            "SLURM_NTASKS": "2",
            "SLURM_PROCID": str(rank),
            "SLURM_LOCALID": str(rank),
        }))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process CLI hung:\n" + "\n".join(o or "" for o in outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    # per-rank shard artifacts exist
    for rank in range(2):
        assert (out_multi / f"act_clip_val.json.rank{rank}").exists()

    single = json.load(open(out_single / "act_clip_val.json"))
    merged = json.load(open(out_multi / "act_clip_val.json"))
    assert set(single) == set(merged)
    for name in single:
        np.testing.assert_array_equal(np.asarray(single[name], dtype=np.float64),
                                      np.asarray(merged[name], dtype=np.float64),
                                      err_msg=name)

    # the shards differ from the whole -> the merge actually did something
    rank0 = json.load(open(out_multi / "act_clip_val.json.rank0"))
    assert any(tuple(rank0[n]) != tuple(merged[n]) for n in merged)

    # profiling merge artifacts from both ranks
    assert (out_multi / "model_res.json.rank0").exists()
    assert (out_multi / "model_res.json.rank1").exists()
    # deploy emitted by rank 0 only, from merged ranges
    trt_single = json.load(open(out_single / "trt_clip_val.json"))
    trt_multi = json.load(open(out_multi / "trt_clip_val.json"))
    assert trt_single == trt_multi
