from .graph import GraphIR, node_attrs, validate_graph, INPUT_TOKEN, OUTPUT_TOKEN  # noqa: F401
from .passes import simplify_graph  # noqa: F401
