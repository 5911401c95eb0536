"""Worker for the real 2-process jax.distributed test (not a pytest file).

Usage: python distributed_worker.py <port> <process_id> <outdir>

Exercises the actual multi-host contract of the framework — the DCN
collective clip merge (parallel/mesh.py reduce_clip_val_collective,
semantics of reference utils.py:326-345), the process barrier, and the
rank-file profiling reduce (reference utils.py:386-412) — with two real
OS processes on the CPU backend."""
import json
import os
import sys

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()
assert rank == pid

from dipoorlet_tpu.__main__ import _barrier  # noqa: E402
from dipoorlet_tpu.parallel import reduce_clip_val_collective  # noqa: E402
from dipoorlet_tpu.utils.serialization import (reduce_profiling_res,  # noqa: E402
                                               save_profiling_res)

# deterministic per-rank shard stats
local = {"a": [-1.0 - rank, 2.0 + rank], "b": [0.5 * (rank + 1), 4.0 - rank]}
mm = reduce_clip_val_collective({k: list(v) for k, v in local.items()}, "minmax")
hist = reduce_clip_val_collective({k: list(v) for k, v in local.items()}, "hist")
_barrier()


# the multi-host weight invariant detector: identical graphs pass,
# rank-dependent weights raise
from dipoorlet_tpu import onnx_ir as oir  # noqa: E402
from dipoorlet_tpu.graph import GraphIR  # noqa: E402
from dipoorlet_tpu.parallel import assert_rank_identical  # noqa: E402
import numpy as np  # noqa: E402


def _toy_graph(value):
    w = oir.array_to_tensor(np.full((2, 2), value, np.float32), "w")
    nodes = [oir.make_node("MatMul", ["x", "w"], ["y"], name="mm")]
    graph = oir.make_graph(
        nodes, "g", [oir.make_tensor_value_info("x", oir.DataType.FLOAT, [1, 2])],
        [oir.make_tensor_value_info("y", oir.DataType.FLOAT, [1, 2])],
        initializer=[w])
    return GraphIR(oir.make_model(graph))


assert_rank_identical(_toy_graph(1.0), "same")   # must not raise
try:
    assert_rank_identical(_toy_graph(float(rank)), "diverged")
    raise SystemExit("divergence not detected")
except RuntimeError:
    pass


class _Args:
    output_dir = outdir
    model_type = None


layer = {"n1": 0.9 + 0.05 * rank}
model = {"out": [0.8 + 0.1 * rank, 0.7 - 0.2 * rank]}
save_profiling_res(layer, model, _Args, rank=rank)
_barrier()  # all rank files on disk before rank 0 merges

if rank == 0:
    lc, mc = reduce_profiling_res(2, _Args)
    result = {
        "mm": {k: [float(v[0]), float(v[1])] for k, v in mm.items()},
        "hist": {k: [float(v[0]), float(v[1])] for k, v in hist.items()},
        "layer": lc,
        "model": mc,
    }
    with open(os.path.join(outdir, "result.json"), "w") as f:
        json.dump(result, f)
_barrier()  # both processes exit only after the merge is written
print(f"worker {rank} ok", flush=True)
