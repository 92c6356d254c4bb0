from graph_physics_tpu.ops import segment
from graph_physics_tpu.ops import edge_attention
from graph_physics_tpu.ops import voperators

__all__ = ["segment", "edge_attention", "voperators"]
