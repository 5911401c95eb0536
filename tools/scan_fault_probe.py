"""Bisect the long-scan TPU-worker kernel fault on its real variable.

Round-4 observed a REPEATABLE worker crash on the single 5000-step
reconstruction scan at the BRECQ 2-conv-block@224 shapes, while the
single-layer AdaRound scan at LARGER per-step activation bytes ran
clean — so activation bytes alone cannot be the trigger, and the r4
auto-chunk guard keyed on a `len(specs) > 1` proxy.  This probe runs a
bounded config matrix of unchunked learn_block calls, each in its own
subprocess (a worker fault kills the process, not the driver), and
records ok/crash per config so the production guard can key on measured
structure instead of a guess (round-4 verdict item 2).

Usage:
  python tools/scan_fault_probe.py --one <config>   # run one config (TPU)
  python tools/scan_fault_probe.py --all            # drive matrix, write JSON
"""
import argparse
import json
import os
import subprocess
import sys
import time

# (name, n_layers, in_shape, out_ch, batch, n_samples, iters, drop)
# in_shape excludes the batch dim; conv is 3x3 pad 1 (shape-preserving)
# except adaround224 which mimics ResNet conv1 (7x7 stride 2).
CONFIGS = {
    # the r4 crash regime: BRECQ 2-conv block @224, QDrop on
    "brecq224": (2, (64, 56, 56), 64, 32, 64, 5000, True),
    # same block, stochastic paths off: isolates the QDrop RNG/program size
    "brecq224_nodrop": (2, (64, 56, 56), 64, 32, 64, 5000, False),
    # one layer, QDrop on, same shapes: isolates layer count
    "single_drop": (1, (64, 56, 56), 64, 32, 64, 5000, True),
    # r4-known-good control: single-layer AdaRound at LARGER activations
    "adaround224": (1, (3, 224, 224), 64, 64, 64, 5000, False),
    # crash regime at half the scan length: scan-length threshold
    "brecq224_2500": (2, (64, 56, 56), 64, 32, 64, 2500, True),
    # the real BasicBlock program: fused ReLU after each conv + biases
    # (the plain brecq224 config lacks both and did NOT crash; the full
    # CLI block DID — isolate program structure vs pipeline context)
    "brecq224_relu": (2, (64, 56, 56), 64, 32, 64, 5000, True),
}
RELU_CONFIGS = {"brecq224_relu"}


def run_one(name, iters_override=None, cpu=False):
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu" if cpu else "axon,cpu")
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dipoorlet_tpu import onnx_ir as oir
    from dipoorlet_tpu.quant.qparams import compute_qparams
    from dipoorlet_tpu.wtrans.reconstruct import (LayerSpec, learn_block,
                                                  node_signature)

    n_layers, in_shape, cout, bs, n, iters, drop = CONFIGS[name]
    if iters_override:
        iters = iters_override
    os.environ["DIPOORLET_TPU_SCAN_CHUNK"] = "0"  # force unchunked
    rng = np.random.RandomState(7)
    cin = in_shape[0]
    if name == "adaround224":
        node = oir.make_node("Conv", ["x", "w"], ["y"], name="c",
                             kernel_shape=[7, 7], pads=[3, 3, 3, 3],
                             strides=[2, 2], dilations=[1, 1], group=1)
        kshape = (cout, cin, 7, 7)
        out_shape = (cout, in_shape[1] // 2, in_shape[2] // 2)
    else:
        node = oir.make_node("Conv", ["x", "w"], ["y"], name="c",
                             kernel_shape=[3, 3], pads=[1, 1, 1, 1],
                             strides=[1, 1], dilations=[1, 1], group=1)
        kshape = (cout, cin, 3, 3)
        out_shape = (cout,) + in_shape[1:]

    qi = {"bit_width": 8, "symmetric": True, "type": "Linear"}
    specs = []
    for li in range(n_layers):
        c_in = cin if li == 0 else cout
        w = (rng.randn(*((kshape[0], c_in) + kshape[2:])) * 0.2).astype(np.float32)
        qw = {"bit_width": 4, "symmetric": True, "per_channel": True,
              "type": "Linear"}
        qp = compute_qparams(qw, w.reshape(cout, -1).min(-1),
                             w.reshape(cout, -1).max(-1))
        aqp = compute_qparams(qi, -3.0, 3.0) if drop else None
        relu = name in RELU_CONFIGS
        bias = jnp.asarray((rng.randn(cout) * 0.05).astype(np.float32)) \
            if relu else None
        specs.append(LayerSpec(node_sig=node_signature(node),
                               weight=jnp.asarray(w), bias=bias, qp=qp,
                               per_channel=True, transposed=False,
                               relu=relu, acti_qp=aqp))
    q_in = rng.randn(n, *in_shape).astype(np.float32)
    fp_in = (q_in + 0.01 * rng.randn(*q_in.shape)).astype(np.float32) \
        if drop else None
    fp_out = rng.randn(n, *out_shape).astype(np.float32)
    t0 = time.time()
    masks = learn_block(specs, q_in, fp_out, batch_size=bs, max_epoch=iters,
                        total_iter=iters, acti_quant=drop, drop=drop,
                        fp_in=fp_in, seed=3)
    # force full materialization off-device (relay: device_get, not block)
    s = float(np.sum([np.abs(np.asarray(m)).sum() for m in masks]))
    print(json.dumps({"config": name, "ok": True,
                      "wall_s": round(time.time() - t0, 1),
                      "mask_abs_sum": s}))


def drive_all(timeout_s):
    out = {}
    here = os.path.abspath(__file__)
    for name in CONFIGS:
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, here, "--one", name],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            tail = (r.stdout + r.stderr)[-3000:]
            ok_line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            out[name] = {
                "rc": r.returncode,
                "ok": r.returncode == 0 and bool(ok_line),
                "wall_s": round(time.time() - t0, 1),
                "result": json.loads(ok_line[-1]) if ok_line and
                          r.returncode == 0 else None,
                "stderr_tail": tail if r.returncode != 0 else "",
            }
        except subprocess.TimeoutExpired as e:
            out[name] = {"rc": None, "ok": False, "timeout": True,
                         "wall_s": round(time.time() - t0, 1),
                         "stderr_tail": str(e.stderr or "")[-3000:]}
        print(name, "->", "OK" if out[name]["ok"] else
              f"FAIL rc={out[name]['rc']}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=str, default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", type=str, default="docs/SCAN_FAULT_PROBE.json")
    args = ap.parse_args()
    if args.one:
        run_one(args.one, args.iters, args.cpu)
        return
    if args.all:
        res = drive_all(args.timeout)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
