"""TensorRT range emitter (parity: deploy/deploy_trt.py:7-16)."""
import json
import os

import numpy as np

from . import deploy_dispatcher


@deploy_dispatcher.add("trt")
def gen_trt_range(graph, clip_val, args, **kwargs):
    out = {}
    for k, v in clip_val.items():
        out[k] = float(max(-np.float64(np.min(v[0])), np.float64(np.max(v[1]))))
    with open(os.path.join(args.output_dir, "trt_clip_val.json"), "w") as f:
        json.dump({"blob_range": out}, f, indent=4)
