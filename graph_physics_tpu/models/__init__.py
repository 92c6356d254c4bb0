from graph_physics_tpu.models.normalizer import (
    NormalizerState,
    normalizer_init,
    normalize,
    normalizer_inverse,
)
from graph_physics_tpu.models import layers
from graph_physics_tpu.models.processors import (
    EncodeProcessDecode,
    EncodeTransformDecode,
    TransolverProcessor,
)
from graph_physics_tpu.models.simulator import Simulator, SimulatorOutput

__all__ = [
    "NormalizerState",
    "normalizer_init",
    "normalize",
    "normalizer_inverse",
    "layers",
    "EncodeProcessDecode",
    "EncodeTransformDecode",
    "TransolverProcessor",
    "Simulator",
    "SimulatorOutput",
]
