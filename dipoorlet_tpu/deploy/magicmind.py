"""MagicMind quant-param emitter (parity: deploy/deploy_magicmind.py:9-20)."""
import json
import os

import numpy as np

from . import deploy_dispatcher


@deploy_dispatcher.add("magicmind")
def gen_magicmind_proto(graph, clip_val, args, **kwargs):
    param = {}
    for k, v in clip_val.items():
        param[k] = {"min": float(np.min(v[0])), "max": float(np.max(v[1]))}
    with open(os.path.join(args.output_dir, "magicmind_quant_param.json"), "wt") as f:
        json.dump({"blob_range": param}, f, indent=4)
