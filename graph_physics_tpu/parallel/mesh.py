"""Device-mesh helpers: axis conventions and sharding constructors.

Axis conventions for this framework:
  * 'dp' — data parallel: the batch axis of stacked graphs. Gradients and
    normalizer statistics all-reduce over it (XLA inserts the collectives
    under jit; SURVEY.md §2.4: the moral equivalent of the reference's
    latent DDP seam). The fused Pallas path cannot use GSPMD (custom
    calls replicate) — it runs under shard_map instead: parallel/dp.py.
  * 'sp' — spatial/graph parallel: nodes+edges of ONE large mesh sharded
    across chips with halo gathers (parallel/sp.py) — the principled
    upgrade of the reference's METIS sub-mesh training.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('dp', 'sp') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // sp
    used = devices[: dp * sp]
    return Mesh(np.array(used).reshape(dp, sp), ("dp", "sp"))


def batch_sharding(mesh: Mesh):
    """Per-leaf NamedSharding: batch axis over 'dp', rest replicated."""

    def spec_for(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (np.ndim(leaf) - 1))))

    return spec_for


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
