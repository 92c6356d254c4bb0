"""Fused Pallas TPU kernel: receiver-sorted segment sum (message scatter).

The hot op of MeshGraphNet message passing (SURVEY.md §3.2: segment-sum of
edge messages into nodes, reference layers.py:926,1031-1037). XLA lowers
``segment_sum`` to a scatter-add, which serializes on TPU; this kernel
exploits the framework's receiver-sorted edge invariant
(core/graph.py): each node tile owns a contiguous edge range, so the
scatter becomes a sequence of tile-local one-hot matmuls on the MXU —
no conflicts, no serialization.

Layout:
  * grid over node tiles of TN rows; program i reduces edge rows
    [row_ptr[i·TN], row_ptr[(i+1)·TN]) in chunks of CE;
  * per chunk: build the [TN, CE] membership matrix by comparing the
    chunk's receiver ids against the tile's node ids (broadcasted iota)
    and accumulate ``membership @ chunk_values`` into a VMEM accumulator;
  * ``row_ptr`` rides scalar prefetch (SMEM) so chunk bounds are known
    before the body runs.

Gradient: d/dvalues is a plain gather (values[recv]) — defined via
``jax.custom_vjp`` so the backward pass never touches scatter either.

Both forward shapes must satisfy the invariant; the public entry point
falls back to ``jax.ops.segment_sum`` off-TPU or when shapes are awkward.

Measured regime guidance (TPU v5e, E=11.5k/H=32 cylinder scale): XLA's
scatter (~60µs/graph batched) beats this kernel — grid overhead dominates
tiny graphs, and vmap serializes pallas_call per batch element. The kernel
is the scaling path for LARGE single meshes (E >> 100k, sp-sharded) where
the one-shot scatter serializes; it is opt-in via ``edges_sorted=True``
callers, not the default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: TN node rows per program, CE edge rows per inner chunk.
TN = 256
CE = 256


def _kernel(row_ptr_ref, recv_ref, vals_ref, out_ref):
    i = pl.program_id(0)
    n_start = i * TN
    e_start = row_ptr_ref[i]
    e_end = row_ptr_ref[i + 1]
    e_total = vals_ref.shape[0]

    h = vals_ref.shape[1]
    acc0 = jnp.zeros((TN, h), jnp.float32)

    num_chunks = (e_end - e_start + CE - 1) // CE

    node_ids = n_start + jax.lax.broadcasted_iota(jnp.int32, (TN, CE), 0)

    def body(c, acc):
        lb = e_start + c * CE  # logical chunk start
        # physical window start clamped in-bounds; `valid` masks rows
        # outside [lb, min(lb+CE, e_end)) so clamp overlap never
        # double-counts
        base = jnp.minimum(lb, e_total - CE)
        ev = vals_ref[pl.ds(base, CE), :]  # [CE, H]
        er = recv_ref[pl.ds(base, CE), 0]  # [CE]
        offs = jax.lax.broadcasted_iota(jnp.int32, (TN, CE), 1)
        eidx = base + offs
        valid = (eidx >= lb) & (eidx < lb + CE) & (eidx < e_end)
        member = (er[None, :] == node_ids) & valid
        onehot = member.astype(jnp.float32)
        return acc + jax.lax.dot_general(
            onehot,
            ev.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # exact accumulation: default MXU f32 uses bf16 passes
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, num_chunks, body, acc0)
    out_ref[:] = acc.astype(out_ref.dtype)


def _row_ptr_for_tiles(receivers: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Edge offsets of each node-tile boundary (searchsorted, on device)."""
    num_tiles = (num_segments + TN - 1) // TN
    bounds = jnp.arange(num_tiles + 1, dtype=jnp.int32) * TN
    return jnp.searchsorted(receivers, bounds).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sorted_segment_sum(
    values: jnp.ndarray,  # [E, H]
    receivers: jnp.ndarray,  # [E] int32, ASCENDING
    num_segments: int,
) -> jnp.ndarray:
    """Segment sum over receiver-sorted edges. out[n] = Σ_{recv==n} values."""
    return _forward(values, receivers, num_segments)


def _forward(values, receivers, num_segments):
    e, h = values.shape
    n_pad = ((num_segments + TN - 1) // TN) * TN
    num_tiles = n_pad // TN
    if e < CE:  # tiny graphs: XLA path is fine
        return jax.ops.segment_sum(values, receivers, num_segments=num_segments)

    row_ptr = _row_ptr_for_tiles(receivers, num_segments)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # recv [E, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vals [E, H]
        ],
        out_specs=pl.BlockSpec(
            (TN, h), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, h), values.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * e * h * 2,  # membership compare + matmul accumulate
            bytes_accessed=e * h * values.dtype.itemsize + n_pad * h * 4,
            transcendentals=0,
        ),
    )(row_ptr, receivers.astype(jnp.int32).reshape(e, 1), values)
    return out[:num_segments]


def _fwd(values, receivers, num_segments):
    return _forward(values, receivers, num_segments), receivers


def _bwd(num_segments, receivers, g):
    # d/dvalues of a segment sum is a gather of the cotangent
    return jnp.take(g, receivers, axis=0), None


sorted_segment_sum.defvjp(_fwd, _bwd)


def segment_sum_auto(
    values: jnp.ndarray,
    receivers: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    edges_sorted: bool = False,
) -> jnp.ndarray:
    """Dispatch: Pallas sorted kernel on TPU when the invariant holds,
    XLA segment_sum otherwise. Masked lanes are zeroed first either way."""
    if mask is not None:
        m = mask
        while m.ndim < values.ndim:
            m = m[..., None]
        values = jnp.where(m, values, jnp.zeros_like(values))
    on_tpu = jax.devices()[0].platform == "tpu"
    if edges_sorted and on_tpu and values.ndim == 2:
        return sorted_segment_sum(values, receivers, num_segments)
    return jax.ops.segment_sum(values, receivers, num_segments=num_segments)
