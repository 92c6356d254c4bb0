"""On-device training-noise injection (jit-safe, PRNG-threaded).

Spec: graphphysics/dataset/preprocessing.py:177-239 — Gaussian noise on
configured column ranges of ``x``, zeroed for non-NORMAL nodes, optional
cosine curriculum ``10·σ·(1+cos(tπ))``. The reference runs this on CPU in
DataLoader workers with global torch RNG; here it runs inside the jitted
train step with an explicit key (the jraphphysics port pioneered this:
jraphphysics/dataset/preprocessing.py:7-83).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.core.nodetype import NodeType


def add_noise(
    graph: MeshGraph,
    rng: jax.Array,
    noise_index_start: Union[int, Sequence[int]],
    noise_index_end: Union[int, Sequence[int]],
    noise_scale: Union[float, Sequence[float]],
    t: Optional[jnp.ndarray] = None,
) -> MeshGraph:
    """Return ``graph`` with noise added to x[..., s:e] on NORMAL nodes.

    ``t`` (traced scalar in [0,1]) enables the cosine curriculum.
    Column ranges are static Python ints (compile-time slices).
    """
    starts = [noise_index_start] if isinstance(noise_index_start, int) else list(noise_index_start)
    ends = [noise_index_end] if isinstance(noise_index_end, int) else list(noise_index_end)
    scales = (
        [noise_scale] * len(starts)
        if isinstance(noise_scale, (int, float))
        else list(noise_scale)
    )
    if len(starts) != len(ends) or len(scales) != len(starts):
        raise ValueError("noise index/scale lists must have equal length")

    normal = graph.node_type == NodeType.NORMAL
    x = graph.x
    while normal.ndim < x.ndim:  # broadcast over batch/feature dims
        normal = normal[..., None]
    keys = jax.random.split(rng, len(starts))
    for key, s, e, scale in zip(keys, starts, ends, scales):
        feature = x[..., s:e]
        scale_ = (
            10.0 * scale * (1.0 + jnp.cos(t * jnp.pi)) if t is not None else scale
        )
        noise = jax.random.normal(key, feature.shape, dtype=feature.dtype) * scale_
        noise = jnp.where(normal, noise, 0.0)
        x = x.at[..., s:e].set(feature + noise)
    return graph.replace(x=x)
