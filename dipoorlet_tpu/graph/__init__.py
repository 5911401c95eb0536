from .graph import GraphIR, node_attrs, INPUT_TOKEN, OUTPUT_TOKEN  # noqa: F401
from .passes import simplify_graph  # noqa: F401
