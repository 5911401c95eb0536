"""Atlas quant-param emitter (parity: deploy/deploy_atlas.py:10-32)."""
import json
import os

import numpy as np

from . import deploy_dispatcher
from ..quant.platform import platform_setting_table

ATLAS_QUANT_LAYER = platform_setting_table["atlas"]["quant_nodes"]


def get_step_zeropoint(clip):
    range_min = min(0.0, float(np.min(clip[0])))
    range_max = max(0.0, float(np.max(clip[1])))
    step = (range_max - range_min) / 255.0
    if step == 0.0:
        step = 1.0
    zero_point = round(-range_min / step) - 128
    return {"scale": step, "offset": int(zero_point)}


@deploy_dispatcher.register("atlas")
def gen_atlas_quant_param(graph, clip_val, args, **kwargs):
    res = {}
    for node in graph.graph.node:
        if node.op_type in ATLAS_QUANT_LAYER:
            tensor_name = node.input[0]
            res[tensor_name] = get_step_zeropoint(clip_val[tensor_name])
    with open(os.path.join(args.output_dir, "atlas_quant_param.json"), "w") as f:
        json.dump(res, f, indent=4)
