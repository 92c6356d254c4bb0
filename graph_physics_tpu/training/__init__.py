from graph_physics_tpu.training import loss as loss_lib
from graph_physics_tpu.training import schedule
