from graph_physics_tpu.parallel.mesh import make_mesh, batch_sharding
from graph_physics_tpu.parallel import dp, sp

__all__ = ["make_mesh", "batch_sharding", "dp", "sp"]
