from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.core import padding
from graph_physics_tpu.core import mesh

__all__ = ["NodeType", "MeshGraph", "padding", "mesh"]
