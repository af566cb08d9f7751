from graph_tpu.io.edgelist import EdgeListInput
from graph_tpu.io.graph500 import Graph500Input
from graph_tpu.io.binary import BinaryInput
from graph_tpu.io.datasets import graph500_path, load_graph500

__all__ = ["EdgeListInput", "Graph500Input", "BinaryInput",
           "graph500_path", "load_graph500"]
