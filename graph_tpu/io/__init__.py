from graph_tpu.io.edgelist import EdgeListInput
from graph_tpu.io.graph500 import Graph500Input
from graph_tpu.io.binary import BinaryInput

__all__ = ["EdgeListInput", "Graph500Input", "BinaryInput"]
