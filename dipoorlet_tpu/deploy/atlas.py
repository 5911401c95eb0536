"""Atlas quant-param emitter (parity: deploy/deploy_atlas.py:10-32)."""
import json
import os

import numpy as np

from . import deploy_dispatcher
from ..quant.platform import platform_setting_table

ATLAS_QUANT_LAYER = platform_setting_table["atlas"]["quant_nodes"]


def _u8_affine(clip):
    """u8 affine step + signed offset (u8 code - 128) covering a range
    widened to include zero; degenerate ranges quantize with step 1."""
    lo = min(0.0, float(np.min(clip[0])))
    hi = max(0.0, float(np.max(clip[1])))
    step = (hi - lo) / 255.0 or 1.0
    return {"scale": step, "offset": round(-lo / step) - 128}


@deploy_dispatcher.add("atlas")
def gen_atlas_quant_param(graph, clip_val, args, **kwargs):
    inputs_to_quant = (n.input[0] for n in graph.graph.node
                       if n.op_type in ATLAS_QUANT_LAYER)
    res = {name: _u8_affine(clip_val[name]) for name in inputs_to_quant}
    with open(os.path.join(args.output_dir, "atlas_quant_param.json"), "w") as f:
        json.dump(res, f, indent=4)
