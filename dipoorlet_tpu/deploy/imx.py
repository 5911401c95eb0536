"""IMX power-of-two scale emitter (parity: deploy/deploy_imx.py:9-30)."""
import json
import os

import numpy as np

from . import deploy_dispatcher


@deploy_dispatcher.add("imx")
def gen_imx_range(graph, clip_val, args, **kwargs):
    bit_width = 8
    scales = {}
    for k, v in clip_val.items():
        if k.endswith(".bias"):
            continue
        clip_max = np.max(np.abs(np.stack([np.asarray(v[0], dtype=np.float64),
                                           np.asarray(v[1], dtype=np.float64)])), axis=0)
        q_max = 2 ** (bit_width - 1) - 1
        scale = np.asarray(clip_max, dtype=np.float64) / q_max
        scale = np.where(scale == 0, 1.0, scale)
        scale = 2.0 ** np.round(np.log2(scale))
        scales[k] = scale.tolist()
    with open(os.path.join(args.output_dir, "imx_scale.json"), "w") as f:
        json.dump({"blob_range": scales}, f, indent=4)
