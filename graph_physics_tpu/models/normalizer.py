"""Running-statistics normalizer with explicit, jit-safe state.

The reference keeps running mean/std in torch buffers mutated in-place
during forward (graphphysics/models/layers.py:281-405). Under XLA there is
no in-place module state, so the normalizer is a pure function over an
explicit :class:`NormalizerState` pytree that the train step threads and
the checkpointer persists (normalizer state is part of the model contract:
reference simulator.py:226-275 checkpoints it).

Semantics matched to the reference:
  * accumulate only while ``num_accumulations < max_accumulations``
    (layers.py:346-349), counted per *call*, not per row;
  * mean/std from acc_sum / acc_sum_squared with safe count >= 1;
  * std clamped below by ``std_epsilon`` (1e-8);
  * statistics always accumulated in fp32.

TPU additions: a validity mask so padded nodes never pollute statistics
(the reference has no padding), and a data-parallel ``axis_name`` so
per-chip partial sums are ``psum``-ed — giving *global* statistics exactly
as if accumulation ran on one device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

MAX_ACCUMULATIONS = 10**5
STD_EPSILON = 1e-8


@struct.dataclass
class NormalizerState:
    acc_sum: jnp.ndarray  # [F] fp32
    acc_sum_sq: jnp.ndarray  # [F] fp32
    acc_count: jnp.ndarray  # [] fp32 — total rows accumulated
    num_accumulations: jnp.ndarray  # [] fp32 — total calls accumulated
    max_accumulations: float = struct.field(pytree_node=False, default=MAX_ACCUMULATIONS)
    std_epsilon: float = struct.field(pytree_node=False, default=STD_EPSILON)


def normalizer_init(
    size: int,
    max_accumulations: float = MAX_ACCUMULATIONS,
    std_epsilon: float = STD_EPSILON,
) -> NormalizerState:
    # distinct arrays: aliased buffers break jit donation (donate-twice)
    return NormalizerState(
        acc_sum=jnp.zeros((size,), dtype=jnp.float32),
        acc_sum_sq=jnp.zeros((size,), dtype=jnp.float32),
        acc_count=jnp.zeros((), jnp.float32),
        num_accumulations=jnp.zeros((), jnp.float32),
        max_accumulations=float(max_accumulations),
        std_epsilon=float(std_epsilon),
    )


def _mean_std(state: NormalizerState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    safe = jnp.maximum(state.acc_count, 1.0)
    mean = state.acc_sum / safe
    var = state.acc_sum_sq / safe - mean**2
    std = jnp.sqrt(jnp.clip(var, min=0.0))
    return mean, jnp.maximum(std, state.std_epsilon)


def normalize(
    state: NormalizerState,
    data: jnp.ndarray,  # [..., F]
    mask: Optional[jnp.ndarray] = None,  # [...] bool over rows
    accumulate: bool = False,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, NormalizerState]:
    """Normalize ``data``; optionally fold its statistics into ``state``.

    ``accumulate`` is a static Python bool (training vs eval program).
    When ``axis_name`` is set, partial sums are psum-ed across that mesh
    axis before accumulation (the DP-global statistics upgrade of the
    reference's single-device accumulator).
    """
    if accumulate:
        d = jax.lax.stop_gradient(data.astype(jnp.float32))
        flat = d.reshape(-1, d.shape[-1])
        if mask is not None:
            m = mask.reshape(-1, 1).astype(jnp.float32)
            s = jnp.sum(flat * m, axis=0)
            s2 = jnp.sum(flat * flat * m, axis=0)
            cnt = jnp.sum(m)
        else:
            s = jnp.sum(flat, axis=0)
            s2 = jnp.sum(flat * flat, axis=0)
            cnt = jnp.asarray(flat.shape[0], jnp.float32)
        ncalls = jnp.asarray(1.0, jnp.float32)
        if axis_name is not None:
            # global statistics: the shards jointly form ONE global-view
            # accumulation call, so sums are psum-ed but the call count
            # stays 1 (matches the unsharded program exactly)
            s = jax.lax.psum(s, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
        allow = (state.num_accumulations < state.max_accumulations).astype(jnp.float32)
        state = state.replace(
            acc_sum=state.acc_sum + allow * s,
            acc_sum_sq=state.acc_sum_sq + allow * s2,
            acc_count=state.acc_count + allow * cnt,
            num_accumulations=state.num_accumulations + allow * ncalls,
        )
    mean, std = _mean_std(state)
    out = (data.astype(jnp.float32) - mean) / std
    return out.astype(data.dtype), state


def normalizer_inverse(state: NormalizerState, data: jnp.ndarray) -> jnp.ndarray:
    """Inverse transform (layers.py:351-362)."""
    mean, std = _mean_std(state)
    return (data.astype(jnp.float32) * std + mean).astype(data.dtype)
