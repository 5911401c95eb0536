"""Run the five BASELINE.json benchmark configs through the production CLI
and record wall-clock + artifact evidence (docs/CONFIG_MATRIX.json).

  1. minmax per-tensor INT8 activation calibration (ResNet-18, 100 samples)
  2. hist-KL + mse clipping search, per-channel weights (MobileNet-v2 INT8)
  3. BiasCorrection + WeightEqualization (MobileNet-v2 INT8, trt + snpe emit)
  4. AdaRound layer-wise reconstruction (ResNet-50 W4A8)
  5. BRECQ + QDrop block reconstruction + per-layer SNR profiling
     (RegNet-600M W4A4)

Usage: python tools/config_matrix.py [--cpu] [--ada_epoch 100] [--img 224]
Reconstruction sizes are bench-scale (16 samples, --ada_epoch default 100
— the reference default 5000 scales linearly in the on-device scan)."""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

CACHE = os.path.join(ROOT, ".model_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure(name, img):
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"{name}_{img}.onnx")
    if not os.path.exists(path):
        from torch_export import export_zoo_model
        log(f"exporting {name} @{img} ...")
        export_zoo_model(name, path, image_size=img)
    return path


def ensure_data(img, n):
    data_dir = os.path.join(CACHE, f"calib_{img}_{n}")
    if not os.path.exists(os.path.join(data_dir, ".done")):
        from dipoorlet_tpu.runtime.data import make_synthetic_dataset
        make_synthetic_dataset(data_dir, {"input": [1, 3, img, img]}, n, seed=0)
        open(os.path.join(data_dir, ".done"), "w").write("ok")
    return data_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ada_epoch", type=int, default=100)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--recon_img", type=int, default=112,
                    help="image size for the reconstruction configs (4/5)")
    ap.add_argument("--only", default=None, help="comma list of config ids")
    args = ap.parse_args()

    if not args.cpu and os.environ.get("JAX_PLATFORMS", "") == "axon":
        import jax
        jax.config.update("jax_platforms", "axon,cpu")
    from dipoorlet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(os.path.join(CACHE, "xla_cache"))
    from dipoorlet_tpu.__main__ import main as cli

    ep = str(args.ada_epoch)
    configs = {
        "1_minmax_int8_resnet18": (
            "resnet18", args.img, 100, ["-A", "minmax", "-D", "trt"],
            ["trt_clip_val.json", "quant_model.onnx"]),
        "2_histkl_mse_mobilenetv2": (
            "mobilenet_v2", args.img, 100, ["-A", "kl", "-D", "trt"],
            ["trt_clip_val.json"]),
        "2b_mse_mobilenetv2": (
            "mobilenet_v2", args.img, 100, ["-A", "mse", "-D", "trt"],
            ["trt_clip_val.json"]),
        "3_bc_we_mobilenetv2_snpe": (
            "mobilenet_v2", args.img, 100,
            ["-A", "minmax", "-D", "snpe", "--bc", "--we"],
            ["update_bias_model.onnx", "weight_equal_model.onnx",
             "snpe_encodings.json"]),
        "4_adaround_resnet50_w4a8": (
            "resnet50", args.recon_img, 16,
            ["-A", "minmax", "-D", "trt", "--w_bit", "4", "--adaround",
             "--ada_epoch", ep],
            ["adaround.onnx", "quant_model.onnx"]),
        "5_brecq_qdrop_regnet_w4a4": (
            "regnet_600m", args.recon_img, 16,
            ["-A", "minmax", "-D", "trt", "--w_bit", "4", "--a_bit", "4",
             "--brecq", "--drop", "--ada_epoch", ep],
            ["brecq.onnx", "layer_snr.json", "layer_res.json.rank0"]),
    }
    only = set(args.only.split(",")) if args.only else None
    rows = {}
    for cid, (model, img, n, extra, artifacts) in configs.items():
        if only and not any(cid.startswith(o) for o in only):
            continue
        mp = ensure(model, img)
        dd = ensure_data(img, n)
        out = os.path.join(CACHE, f"cfg_{cid}")
        shutil.rmtree(out, ignore_errors=True)
        argv = ["-M", mp, "-I", dd, "-O", out, "-N", str(n),
                "--batch_size", "16"] + extra
        if args.cpu:
            argv.append("--cpu")
        log(f"=== {cid}: {' '.join(argv)}")
        t0 = time.time()
        cli(argv)
        wall = round(time.time() - t0, 1)
        missing = [a for a in artifacts if not os.path.exists(os.path.join(out, a))]
        rows[cid] = {"model": model, "img": img, "samples": n,
                     "flags": " ".join(extra), "wall_s": wall,
                     "artifacts_ok": not missing, "missing": missing}
        # accuracy number per config: FP-vs-quant top-1 agreement + output
        # cosine over the calibration set, evaluated on the emitted
        # quant_model.onnx (includes any weight-transform updates)
        qm = os.path.join(out, "quant_model.onnx")
        if os.path.exists(qm):
            try:
                from eval_agreement import evaluate_agreement
                from dipoorlet_tpu.graph import GraphIR
                agr = evaluate_agreement(GraphIR.load(mp),
                                         GraphIR.load(qm, simplify=False), dd, n)
                rows[cid]["agreement"] = round(agr["agreement"], 4)
                rows[cid]["avg_cos"] = round(agr["avg_cos"], 4)
            except Exception as e:  # never lose the wall-clock row over this
                rows[cid]["agreement_error"] = f"{type(e).__name__}: {e}"[:120]
        log(f"=== {cid}: {wall}s, artifacts_ok={not missing}, "
            f"agreement={rows[cid].get('agreement')}")
        path = os.path.join(ROOT, "docs", "CONFIG_MATRIX.json")
        merged = dict(rows)
        if os.path.exists(path):
            # partial (--only) runs merge into the recorded matrix
            prior = json.load(open(path)).get("rows", {})
            merged = {**prior, **rows}
        with open(path, "w") as f:
            json.dump({"note": "BASELINE.json config list through the "
                               "production CLI; reconstruction at bench scale "
                               f"(16 samples, {ep} epochs)",
                       "backend": "cpu" if args.cpu else "tpu",
                       "rows": merged}, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
