"""Graph IR: a lightweight, numpy-backed wrapper over an ONNX ModelProto.

API parity target: the reference's ONNXGraph (/root/reference/dipoorlet/
utils.py:22-250) — producer/consumer maps, initializer get/set, node
insertion/removal, shape & dtype maps, model rebuild, deep copy, save.

Design differences from the reference (TPU-first):
  * initializers are cached as numpy arrays (decoded once, not per access);
  * shape/type inference is done by abstract evaluation of our own JAX op
    library (graph/passes.py) instead of relying on onnx shape_inference;
  * graph simplification (constant folding, Identity/Dropout elision) is a
    first-class import pass (graph/passes.py) replacing onnxsim.simplify
    (reference __main__.py:101).
"""
from __future__ import annotations

import copy
import os
from typing import Dict, List, Optional, Union

import numpy as np

from ..onnx_ir import (
    GraphProto,
    ModelProto,
    NodeProto,
    TensorProto,
    ValueInfoProto,
    array_to_tensor,
    get_attribute_value,
    load_model,
    make_model,
    make_tensor_value_info,
    save_model,
    tensor_to_array,
)
from ..onnx_ir.proto import DataType

INPUT_TOKEN = "INPUT_TOKEN"
OUTPUT_TOKEN = "OUTPUT_TOKEN"


def node_attrs(node: NodeProto) -> dict:
    return {a.name: get_attribute_value(a) for a in node.attribute}


class GraphIR:
    def __init__(self, model: Optional[ModelProto] = None, output_dir: str = "",
                 deploy: Optional[str] = None, model_type: Optional[str] = None):
        self.model = model
        self.output_dir = output_dir
        self.deploy = deploy
        self.model_type = model_type
        self.base_dir = ""  # directory of the source .onnx (external data)

        self.initializer: Dict[str, np.ndarray] = {}
        self._init_proto_idx: Dict[str, int] = {}
        self.input_map: Dict[str, List[NodeProto]] = {}   # tensor -> consumer nodes
        self.output_map: Dict[str, NodeProto] = {}        # tensor -> producer node
        self.network_inputs: List[str] = []
        self.network_outputs: List[str] = []
        self.tensor_name_shape_map: Dict[str, list] = {}
        self.value_name_type_map: Dict[str, int] = {}
        self.name_idx_map: Dict[str, int] = {}
        self.input: List[str] = []
        self.output: List[str] = []

        if self.model is not None:
            self._build()

    # ------------------------------------------------------------------
    @property
    def graph(self) -> GraphProto:
        return self.model.graph

    @property
    def nodes(self) -> List[NodeProto]:
        return list(self.model.graph.node)

    @classmethod
    def load(cls, path: str, output_dir: str = "", deploy: Optional[str] = None,
             model_type: Optional[str] = None, simplify: bool = True) -> "GraphIR":
        model = load_model(path)
        g = cls.__new__(cls)
        GraphIR.__init__(g)
        g.model = model
        g.output_dir = output_dir
        g.deploy = deploy
        g.model_type = model_type
        g.base_dir = os.path.dirname(os.path.abspath(path))
        g._build()
        if simplify:
            from .passes import simplify_graph
            simplify_graph(g)
        return g

    def _build(self):
        self._assign_node_names()
        self._constants_to_initializers()
        self.prepare_initializer()
        self.topologize_graph()
        self.set_index()
        self.get_inp_oup()
        self.get_shape_type()

    def _assign_node_names(self):
        for idx, node in enumerate(self.graph.node):
            if node.name == "":
                node.name = f"{node.op_type}_{idx}"

    def _constants_to_initializers(self):
        remaining = []
        for node in self.graph.node:
            if node.op_type == "Constant":
                attrs = node_attrs(node)
                if "value" in attrs:
                    arr = tensor_to_array(attrs["value"])
                elif "value_float" in attrs:
                    arr = np.float32(attrs["value_float"])
                elif "value_int" in attrs:
                    arr = np.int64(attrs["value_int"])
                elif "value_floats" in attrs:
                    arr = np.asarray(attrs["value_floats"], dtype=np.float32)
                elif "value_ints" in attrs:
                    arr = np.asarray(attrs["value_ints"], dtype=np.int64)
                else:
                    remaining.append(node)
                    continue
                t = array_to_tensor(np.asarray(arr), node.output[0])
                self.graph.initializer.append(t)
            else:
                remaining.append(node)
        if len(remaining) != len(self.graph.node):
            self.graph.node = remaining

    def prepare_initializer(self):
        self.initializer.clear()
        self._init_proto_idx.clear()
        for idx, init in enumerate(self.graph.initializer):
            self.initializer[init.name] = tensor_to_array(init, self.base_dir)
            self._init_proto_idx[init.name] = idx

    def topologize_graph(self):
        self.input_map.clear()
        self.output_map.clear()
        for node in self.graph.node:
            for out in node.output:
                self.output_map[out] = node
            for inp in node.input:
                self.input_map.setdefault(inp, []).append(node)

    def get_tensor_producer(self, name: str) -> Union[str, NodeProto]:
        return self.output_map.get(name, INPUT_TOKEN)

    def get_tensor_consumer(self, name: str) -> List[Union[str, NodeProto]]:
        return self.input_map.get(name, [OUTPUT_TOKEN])

    def get_inp_oup(self):
        self.network_inputs.clear()
        self.network_outputs.clear()
        self.input.clear()
        self.output.clear()
        for vi in self.graph.input:
            if vi.name not in self.output_map and vi.name not in self.initializer:
                self.network_inputs.append(vi.name)
        for vi in self.graph.output:
            self.network_outputs.append(vi.name)
        self.input = self.network_inputs.copy()
        self.output = self.network_outputs.copy()
        for node in self.graph.node:
            for inp in node.input:
                if inp in self.initializer and inp not in self.input:
                    self.input.append(inp)
            for oup in node.output:
                if oup not in self.output:
                    self.output.append(oup)

    def get_shape_type(self):
        """Seed shape/type maps from the proto; intermediates are filled by
        abstract evaluation in infer_shapes()."""
        for vi in list(self.graph.input) + list(self.graph.output) + list(self.graph.value_info):
            tt = vi.type.tensor_type if vi.type else None
            if tt is None:
                continue
            shape = [d.dim_value if d.dim_value else 0 for d in (tt.shape.dim if tt.shape else [])]
            self.tensor_name_shape_map[vi.name] = shape
            self.value_name_type_map[vi.name] = tt.elem_type
        for name, arr in self.initializer.items():
            self.tensor_name_shape_map[name] = list(arr.shape)

    def infer_shapes(self):
        """Fill tensor_name_shape_map via abstract evaluation over the op
        library (no constant folding)."""
        from .passes import simplify_graph
        simplify_graph(self, fold_constants=False)

    def get_tensor_shape(self, name: str) -> list:
        return self.tensor_name_shape_map[name]

    def get_value_type(self, name: str) -> int:
        return self.value_name_type_map.get(name, DataType.FLOAT)

    # -- initializer access -------------------------------------------------
    def get_initializer(self, name: str) -> np.ndarray:
        return self.initializer[name]

    def set_initializer(self, name: str, value: np.ndarray, raw: bool = True):
        value = np.asarray(value)
        proto = array_to_tensor(value, name)
        if name in self._init_proto_idx:
            idx = self._init_proto_idx[name]
            self.graph.initializer[idx] = proto
        else:
            self._init_proto_idx[name] = len(self.graph.initializer)
            self.graph.initializer.append(proto)
        self.initializer[name] = value
        self.tensor_name_shape_map[name] = list(value.shape)

    def del_initializer(self, name: str):
        if name in self._init_proto_idx:
            idx = self._init_proto_idx[name]
            del self.graph.initializer[idx]
            del self.initializer[name]
            self._init_proto_idx.clear()
            for i, init in enumerate(self.graph.initializer):
                self._init_proto_idx[init.name] = i

    # -- node editing --------------------------------------------------------
    def insert_node_purely(self, node: NodeProto, idx: int = 0):
        self.graph.node.insert(idx, node)

    def remove_node_purely(self, node: NodeProto):
        self.graph.node.remove(node)

    def del_network_output(self, name: str):
        idx = self.network_outputs.index(name)
        del self.graph.output[idx]
        self.network_outputs.remove(name)

    def add_network_output(self, vi: ValueInfoProto):
        self.graph.output.append(vi)
        self.network_outputs.append(vi.name)

    def set_index(self):
        self.name_idx_map.clear()
        for idx, node in enumerate(self.graph.node):
            self.name_idx_map[node.name] = idx

    def index(self, node: NodeProto) -> int:
        return self.name_idx_map[node.name]

    def update_model(self):
        self.set_index()
        self.model = make_model(self.graph, producer_name="dipoorlet_tpu",
                                opset_imports=self.model.opset_import,
                                ir_version=self.model.ir_version or 8)
        self.prepare_initializer()
        self.topologize_graph()

    def copy_from(self, src: "GraphIR"):
        # structural copy sharing immutable tensor payloads — NOT an
        # encode/decode round-trip (was ~11 s per clone at 124M params)
        self.model = src.model.copy()
        self.initializer = dict(src.initializer)
        self._init_proto_idx = dict(src._init_proto_idx)
        # proto objects must come from the fresh copy, not the source
        self.prepare_initializer()
        self.topologize_graph()
        self.network_inputs = list(src.network_inputs)
        self.network_outputs = list(src.network_outputs)
        self.tensor_name_shape_map = copy.deepcopy(src.tensor_name_shape_map)
        self.value_name_type_map = dict(src.value_name_type_map)
        self.input = list(src.input)
        self.output = list(src.output)
        self.name_idx_map = dict(src.name_idx_map)
        self.output_dir = src.output_dir
        self.deploy = src.deploy
        self.model_type = src.model_type

    def clone(self) -> "GraphIR":
        g = GraphIR()
        g.copy_from(self)
        return g

    def save_onnx_model(self, name: str = "tmp", size_threshold: int = 2048):
        """Transformer-scale models (model_type set) spill big initializers
        to a sidecar external-data file (reference utils.py:182-190)."""
        path = os.path.join(self.output_dir, f"{name}.onnx")
        if self.model_type is not None:
            self._convert_to_external_data(f"{name}.data", size_threshold)
        save_model(self.model, path)
        return path

    def _convert_to_external_data(self, location: str, size_threshold: int):
        from ..onnx_ir import StringStringEntryProto
        data_path = os.path.join(self.output_dir, location)
        offset = 0
        with open(data_path, "wb") as f:
            for init in self.graph.initializer:
                if len(init.raw_data) <= size_threshold:
                    continue
                raw = init.raw_data
                f.write(raw)
                init.raw_data = b""
                init.data_location = 1
                entries = []
                for key, value in (("location", location), ("offset", str(offset)),
                                   ("length", str(len(raw)))):
                    e = StringStringEntryProto()
                    e.key, e.value = key, value
                    entries.append(e)
                init.external_data = entries
                offset += len(raw)

    # -- traversal helpers ---------------------------------------------------
    def topo_sort(self) -> List[NodeProto]:
        """Kahn topological order over nodes (reference keeps protobuf order;
        we guarantee a valid order regardless of insertion position).

        Control-flow nodes (If/Loop/Scan) implicitly depend on outer-scope
        tensors their subgraphs capture by name; those edges are invisible
        in node.input and must be added or the node could be ordered before
        its captures exist."""
        produced = set(self.network_inputs) | set(self.initializer)
        nodes = list(self.graph.node)
        deps = {}
        all_outputs = {o for n in nodes for o in n.output if o}
        for node in nodes:
            d = [i for i in node.input if i]
            if node.op_type in ("If", "Loop", "Scan"):
                from ..runtime.control_flow import node_captures
                # only TRUE captures that some node here produces are
                # edges; subgraph-internal names (which may legally shadow
                # outer names, and would make spurious edges/cycles) are
                # excluded by node_captures
                d += [t for t in node_captures(node)
                      if t in all_outputs]
            deps[id(node)] = d
        order = []
        pending = nodes
        while pending:
            progressed = False
            rest = []
            for node in pending:
                if all(i in produced for i in deps[id(node)]):
                    order.append(node)
                    produced.update(o for o in node.output if o)
                    progressed = True
                else:
                    rest.append(node)
            if not progressed:
                missing = {i for n in rest for i in deps[id(n)] if i not in produced}
                raise ValueError(f"graph has unreachable inputs or a cycle; missing: {sorted(missing)[:10]}")
            pending = rest
        return order

    def ensure_topological(self):
        order = self.topo_sort()
        if [n.name for n in order] != [n.name for n in self.graph.node]:
            self.graph.node = order
            self.set_index()


def validate_graph(g: "GraphIR"):
    """Light model validation (replaces onnx.checker.check_model at
    reference __main__.py:105-110): every node input must be produced by
    some node, be a graph input, or be an initializer; node names unique."""
    produced = set(g.network_inputs) | set(g.initializer)
    for node in g.graph.node:
        produced.update(o for o in node.output if o)
    problems = []
    seen_names = set()
    for node in g.graph.node:
        if node.name in seen_names:
            problems.append(f"duplicate node name: {node.name}")
        seen_names.add(node.name)
        for inp in node.input:
            if inp and inp not in produced:
                problems.append(f"node {node.name} consumes unknown tensor '{inp}'")
    for out in g.network_outputs:
        if out not in produced:
            problems.append(f"network output '{out}' is never produced")
    if problems:
        raise ValueError("invalid model: " + "; ".join(problems[:10]))
    return True
