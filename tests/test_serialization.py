"""Rank-file clip/profiling reduction tests (utils.py:313-412 semantics)."""
import json
import os

import numpy as np

from dipoorlet_tpu.utils.serialization import (load_clip_val, reduce_clip_val,
                                               reduce_profiling_res,
                                               save_clip_val, save_profiling_res)


class Args:
    def __init__(self, out, act_quant="minmax", deploy="trt"):
        self.output_dir = out
        self.act_quant = act_quant
        self.deploy = deploy
        self.model_type = None


def _write_rank_files(args, per_rank_act):
    wt = {"w": [np.array([-1.0, -2.0]), np.array([1.0, 2.0])]}
    for r, act in enumerate(per_rank_act):
        save_clip_val({k: list(v) for k, v in act.items()},
                      {k: [v[0].copy(), v[1].copy()] for k, v in wt.items()},
                      args,
                      act_fname=f"act_clip_val.json.rank{r}",
                      weight_fname=f"weight_clip_val.json.rank{r}")


def test_reduce_minmax(tmp_path):
    args = Args(str(tmp_path), act_quant="minmax")
    _write_rank_files(args, [
        {"t": [np.float64(-1.0), np.float64(3.0)]},
        {"t": [np.float64(-2.0), np.float64(1.0)]},
    ])
    reduce_clip_val(2, args)
    act, wt = load_clip_val(args)
    assert act["t"][0] == -2.0 and act["t"][1] == 3.0  # elementwise min/max
    np.testing.assert_array_equal(wt["w"][0], [-1.0, -2.0])  # weights from rank0


def test_reduce_mean_for_hist(tmp_path):
    args = Args(str(tmp_path), act_quant="hist")
    _write_rank_files(args, [
        {"t": [np.float64(-1.0), np.float64(3.0)]},
        {"t": [np.float64(-3.0), np.float64(1.0)]},
    ])
    reduce_clip_val(2, args)
    act, _ = load_clip_val(args)
    assert act["t"][0] == -2.0 and act["t"][1] == 2.0  # arithmetic rank mean


def test_reduce_profiling(tmp_path):
    args = Args(str(tmp_path))
    save_profiling_res({"l1": 0.8}, {"out": [0.9, 0.85]}, args, rank=0)
    save_profiling_res({"l1": 0.6}, {"out": [0.7, 0.65]}, args, rank=1)
    layer, model = reduce_profiling_res(2, args)
    assert abs(layer["l1"] - 0.7) < 1e-12          # mean
    assert abs(model["out"][0] - 0.8) < 1e-12      # mean of avg
    assert model["out"][1] == 0.65                 # min of min
