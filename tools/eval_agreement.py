"""Quantization accuracy proxy: top-1 prediction agreement between the
FP32 model and its fake-quant counterpart over a sample set.

With labeled data unavailable in-container, prediction-flip rate is the
measurable stand-in for the top-1 Δ the BASELINE targets track: a
quantization config that flips few predictions preserves top-1.

Usage:
  python tools/eval_agreement.py -M model.onnx -I calib_dir -N 100 -D trt \
      [-A minmax] [--w_bit 4] [--adaround ...]
Prints one JSON line {"agreement": ..., "avg_cos": ..., "n": ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate_agreement(graph_fp, graph_q, input_dir, data_num, batch_size=16):
    import jax
    from dipoorlet_tpu.runtime import Executor
    from dipoorlet_tpu.runtime.data import CalibDataset

    ex_fp = Executor(graph_fp)
    ex_q = Executor(graph_q)
    out_fp_name = graph_fp.network_outputs[0]
    out_q_name = graph_q.network_outputs[0]

    def pair(params_fp, params_q, inputs):
        import jax.numpy as jnp
        a, _ = ex_fp.forward(params_fp, inputs, outputs=[out_fp_name])
        b, _ = ex_q.forward(params_q, inputs, outputs=[out_q_name])
        la = a[out_fp_name].ravel()
        lb = b[out_q_name].ravel()
        agree = (jnp.argmax(la) == jnp.argmax(lb)).astype(jnp.float32)
        cos = jnp.vdot(la, lb) / jnp.maximum(
            jnp.linalg.norm(la) * jnp.linalg.norm(lb), 1e-12)
        return agree, cos

    batched = jax.jit(jax.vmap(pair, in_axes=(None, None, 0)))
    ds = CalibDataset(input_dir, ex_fp.input_shapes(), data_num)
    p_fp = jax.device_put(ex_fp.init_params())
    p_q = jax.device_put(ex_q.init_params())
    agree_sum, cos_sum, n = 0.0, 0.0, 0
    for idx in ds.iter_batches(batch_size):
        batch = ds.load_batch(idx)
        agree, cos = jax.device_get(batched(p_fp, p_q, batch))
        agree_sum += float(np.sum(agree))
        cos_sum += float(np.sum(cos))
        n += len(idx)
    return {"agreement": agree_sum / n, "avg_cos": cos_sum / n, "n": n}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-M", "--model", required=True)
    p.add_argument("-I", "--input_dir", required=True)
    p.add_argument("-N", "--data_num", type=int, required=True)
    p.add_argument("-D", "--deploy", default="trt")
    p.add_argument("-A", "--act_quant", default="minmax",
                   choices=["minmax", "hist", "mse", "kl"])
    p.add_argument("--w_bit", type=int, default=None)
    p.add_argument("--a_bit", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--bins", type=int, default=2048)
    p.add_argument("--threshold", type=float, default=0.99999)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    args.skip_layers = []
    args.rank, args.world_size = 0, 1

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        import jax
        jax.config.update("jax_platforms", "axon,cpu")

    from dipoorlet_tpu.calib import tensor_calibration
    from dipoorlet_tpu.graph import GraphIR
    from dipoorlet_tpu.quant import quant_graph

    g = GraphIR.load(args.model)
    act, wt = tensor_calibration(g, args)
    clip = {**act, **wt}
    gq, _ = quant_graph(g, clip, args)
    res = evaluate_agreement(g, gq, args.input_dir, args.data_num, args.batch_size)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
