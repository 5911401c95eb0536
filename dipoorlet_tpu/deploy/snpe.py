"""SNPE encodings emitter (parity: deploy/deploy_snpe.py:7-34)."""
import json
import os

from . import deploy_dispatcher


def _encoding(clip):
    lo = float(clip[0])
    hi = float(clip[1])
    return [{
        "bitwidth": 8,
        "min": lo,
        "max": max(max(0.0, hi), lo + 0.01),
    }]


@deploy_dispatcher.add("snpe")
def gen_snpe_encodings(graph, clip_val, args, **kwargs):
    activation_encodings = {}
    for node in graph.graph.node:
        for in_tensor in node.input:
            if in_tensor == "" or in_tensor in graph.initializer:
                continue
            activation_encodings[in_tensor] = _encoding(clip_val[in_tensor])
    for out_tensor in graph.network_outputs:
        activation_encodings[out_tensor] = _encoding(clip_val[out_tensor])
    encodings = {"activation_encodings": activation_encodings, "param_encodings": {}}
    with open(os.path.join(args.output_dir, "snpe_encodings.json"), "wt") as f:
        json.dump(encodings, f, indent=4)
