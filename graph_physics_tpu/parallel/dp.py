"""Explicit shard_map data parallelism — required for the fused fast path.

The plain dp story (training/step.make_train_step + a 'dp'-sharded batch)
relies on GSPMD to partition the program. That works for the XLA path,
but a Pallas kernel is a custom call GSPMD cannot partition: it
all-gathers the sharded batch and REPLICATES the kernel on every device
(verified on the fused step's compiled HLO — 75 all-gathers), i.e. fused
training would not scale past one chip. This module runs the SAME train
step inside ``jax.shard_map`` over the 'dp' axis instead: each device
executes the fused kernels on its local batch shard, gradients are
pmean-ed over 'dp' after ``value_and_grad`` (the classic DDP reduction —
exact even under uneven per-shard mask/deselected counts, because plain
losses use a global-denominator masked mean and no differentiated path
crosses shards; see make_train_step's ``dp_axis_name`` docstring), and
normalizer statistics psum through the simulator's ``axis_name``.
``check_vma`` is False by necessity — Pallas calls carry no vma
annotations — which is why the explicit-pmean formulation is used
instead of sp.py's vma-tracked loss-psum one.

Reference seam being upgraded: the latent DDP of the reference's
Lightning trainer (SURVEY.md §2.4; lightning_module.py runs single-GPU
but Lightning would wrap it in DDP all-reduce).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_physics_tpu.core.graph import MeshGraph

#: packed-layout MeshGraph fields laid out [N|W, B] (batch axis 1,
#: ndim 2); every >=3-D leaf is [N|E|W, B, F]. The world-edge sidecar's
#: index/mask arrays are PER-SAMPLE data (world edges change every
#: frame) and must shard with the batch, not replicate like the shared
#: mesh topology. Everything else is topology/metadata shared across
#: the batch.
_PACKED_2D_BATCHED = (
    "deselected", "phi", "wedge_senders", "wedge_receivers", "wedge_mask",
)


def dp_batch_specs(batch: MeshGraph, packed: bool, axis_name: str = "dp"):
    """PartitionSpec pytree (same treedef as ``batch``) splitting the
    batch axis over ``axis_name``.

    Packed layout ([N, B, F] fields, shared topology): axis 1 of >=3-D
    leaves and of the [N, B] deselected/phi masks; topology (senders,
    tiling_idx, ...) replicated. Stacked layout: axis 0 of every
    non-scalar leaf (each sample carries its own topology copy).
    """
    if not packed:
        return jax.tree.map(
            lambda leaf: P(axis_name) if np.ndim(leaf) >= 1 else P(), batch
        )

    def compact(leaf):
        # broadcast-static leaf ([E, 1, F] / [N, 1] view from the
        # loader's compact mode): genuinely identical for every sample,
        # so REPLICATE it — the step re-expands per shard
        # (packed.expand_static_leaves), giving the exact full-width
        # program on each shard's local batch
        return np.ndim(leaf) >= 2 and np.shape(leaf)[1] == 1

    updates = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is None:
            updates[f.name] = None
        elif f.name in _PACKED_2D_BATCHED:
            updates[f.name] = P() if compact(v) else P(None, axis_name)
        elif f.name == "time":
            # pack() keeps per-frame times as a [B] array (packed.py):
            # batch axis 0, unlike every other packed leaf
            updates[f.name] = P(axis_name) if np.ndim(v) >= 1 else P()
        elif f.name == "tiling_idx":
            updates[f.name] = jax.tree.map(lambda _: P(), v)
        else:
            updates[f.name] = jax.tree.map(
                lambda leaf: (
                    P(None, axis_name)
                    if np.ndim(leaf) >= 3 and not compact(leaf)
                    else P()
                ),
                v,
            )
    return batch.replace(**updates)


def make_dp_train_step(
    simulator,
    optimizer,
    loss_fn,
    mesh: Mesh,
    packed: bool = True,
    axis_name: str = "dp",
    donate: bool = True,
    **step_kwargs,
):
    """Jitted shard_map data-parallel train step ``(state, batch, rng) ->
    (state, metrics)`` — the multi-chip path for ``--fused`` training
    (and a drop-in for the XLA path too).

    Contract: ``simulator`` built with ``axis_name=axis_name`` (normalizer
    partial sums psum to global statistics across the batch shards);
    ``batch`` is the global batch, device_put with
    :func:`dp_batch_specs` shardings (per-shard batch = B / mesh dp size;
    B must divide evenly); params/opt state replicated. Each shard folds
    ``axis_index`` into its rng so noise draws are independent across
    shards (the global-batch GSPMD path draws per-sample noise from one
    key; statistically equivalent, bitwise different).

    ``step_kwargs`` forward to :func:`training.step.make_train_step`
    (noise_cfg, mask_types, gradient_method, mtp, ...).
    """
    from graph_physics_tpu.training.step import make_train_step

    _validate_sim_axis(simulator, axis_name, "make_dp_train_step")

    inner = make_train_step(
        simulator, optimizer, loss_fn,
        donate=False, dp_axis_name=axis_name, **step_kwargs,
    )
    body = inner._step_body

    def local_body(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        return body(state, batch, rng)

    def build(batch_specs):
        sharded = jax.shard_map(
            local_body,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            # no vma tracking: Pallas out avals carry no vma annotation
            # (ShapeDtypeStruct.vma=None rejects under check_vma=True).
            # Soundness comes from the explicit grad pmean in step_body.
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    # batch specs depend on which optional MeshGraph fields are present
    # and on leaf ranks, so resolve them per batch LAYOUT (cached —
    # the layout is stable across steps of a run)
    cache = {}
    ndev = int(mesh.shape[axis_name])

    def step(state, batch, rng):
        _validate_batch_divides(
            batch.x.shape[1] if packed else batch.x.shape[0], ndev, axis_name
        )
        key = _layout_key(batch)
        fn = cache.get(key)
        if fn is None:
            fn = build(dp_batch_specs(batch, packed, axis_name))
            cache[key] = fn
        return fn(state, batch, rng)

    return step


def _layout_key(batch):
    """Treedef + per-leaf shape. Ranks alone are NOT enough: a compact
    broadcast-static leaf ([E, 1, F] — or [K, E, 1, F] under the
    multi-step stacking) takes a replicated spec where the full-width
    leaf shards, and a run mixes both (each trajectory's first batch
    builds the skeleton through the per-frame full-width path). Shapes
    over-segment the spec cache slightly; the jit cache inside each
    entry dedups actual compilation."""
    return (
        jax.tree.structure(batch),
        tuple(np.shape(l) for l in jax.tree.leaves(batch)),
    )


def _validate_sim_axis(simulator, axis_name: str, who: str) -> None:
    sim_axes = simulator.axis_name
    sim_axes = (sim_axes,) if isinstance(sim_axes, str) else (sim_axes or ())
    if axis_name not in sim_axes:
        raise ValueError(
            f"{who}: simulator.axis_name={simulator.axis_name!r} "
            f"must include {axis_name!r} so normalizer statistics psum "
            "across the batch shards (build the Simulator with "
            f"axis_name={axis_name!r})"
        )


def _validate_batch_divides(b: int, ndev: int, axis_name: str) -> None:
    if b % ndev:
        raise ValueError(
            f"dp shard_map: batch size {b} must divide evenly over "
            f"the {ndev} '{axis_name}' devices"
        )


def make_dp_multi_step(
    simulator,
    optimizer,
    loss_fn,
    mesh: Mesh,
    unroll: int,
    packed: bool = True,
    axis_name: str = "dp",
    donate: bool = True,
    **step_kwargs,
):
    """shard_map counterpart of :func:`training.step.make_multi_step`:
    ``unroll`` optimizer steps fused into ONE dispatch via ``lax.scan``
    INSIDE the shard_map body (one program, one set of collectives per
    inner step; batch stays sharded throughout).

    ``batch`` must carry a leading [K=unroll] axis of distinct batches
    (the Trainer's pending-flush layout); same sharding contract as
    :func:`make_dp_train_step` on each batch slice.
    """
    from graph_physics_tpu.training.step import make_train_step

    _validate_sim_axis(simulator, axis_name, "make_dp_multi_step")
    ndev = int(mesh.shape[axis_name])

    inner = make_train_step(
        simulator, optimizer, loss_fn,
        donate=False, dp_axis_name=axis_name, **step_kwargs,
    )
    body = inner._step_body

    def local_multi(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        keys = jax.random.split(rng, unroll)

        def scan_body(carry, xs):
            key, b = xs
            return body(carry, b, key)

        return jax.lax.scan(scan_body, state, (keys, batch))

    def build(batch_specs):
        # leading [K] scan axis: unsharded on every leaf
        k_specs = jax.tree.map(
            lambda s: P(None, *tuple(s)) if s is not None else None,
            batch_specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        sharded = jax.shard_map(
            local_multi,
            mesh=mesh,
            in_specs=(P(), k_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,  # see make_dp_train_step
        )
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    cache = {}

    def multi_step(state, batch, rng):
        _validate_batch_divides(
            batch.x.shape[2] if packed else batch.x.shape[1], ndev, axis_name
        )
        key = _layout_key(batch)
        fn = cache.get(key)
        if fn is None:
            one = jax.tree.map(lambda a: a[0], batch)
            fn = build(dp_batch_specs(one, packed, axis_name))
            cache[key] = fn
        return fn(state, batch, rng)

    return multi_step
