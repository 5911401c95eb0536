"""TI blob-range emitter (parity: deploy/deploy_ti.py:7-19)."""
import json
import os

import numpy as np

from . import deploy_dispatcher


@deploy_dispatcher.add("ti")
def gen_ti_json(graph, clip_val, args, **kwargs):
    with open(os.path.join(args.output_dir, "ti_blob_range.txt"), "w") as f:
        for k, v in clip_val.items():
            f.write("{} {} {}\n".format(k, v[0], v[1]))
    blob = {k: [float(np.min(v[0])), float(np.max(v[1]))] for k, v in clip_val.items()}
    with open(os.path.join(args.output_dir, "ti_blob_range.json"), "w") as f:
        json.dump({"blob_range": blob}, f, indent=4)
