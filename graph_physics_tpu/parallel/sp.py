"""Spatial (graph) parallelism: one large mesh sharded across chips.

The reference's only big-mesh story is host-side METIS sub-mesh training
(SURVEY.md §2.4); the TPU-native upgrade shards the nodes and edges of ONE
graph over the 'sp' mesh axis and exchanges neighbour features over ICI:

  * host side (:func:`shard_graph`): RCB-partition the nodes, reorder and
    pad each part to a common size; every edge is owned by its RECEIVER's
    shard (receiver index local, sender index GLOBAL); per-shard edge
    lists padded to a common budget;
  * device side: under ``shard_map`` over 'sp', node MLPs and the message
    scatter are purely local; gathering sender features uses
    ``all_gather`` over ICI (v1 — a ppermute halo exchange is the
    bandwidth-optimal refinement and slots behind the same
    :func:`sp_gather` seam).

Numerical parity with the single-device model is exact (same params, same
math, reordered nodes) — see tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from graph_physics_tpu.core import padding
from graph_physics_tpu.core.graph import PAD_NODE_TYPE, MeshGraph
from graph_physics_tpu.dataset.partition import rcb_partition


def sp_gather(
    x_local: jnp.ndarray,
    global_idx: jnp.ndarray,
    axis_name: str,
    halo_size: Optional[int] = None,
) -> jnp.ndarray:
    """Gather rows by node index from the sp-sharded node array.

    Full mode (``halo_size=None``): all_gather everything over the sp axis
    then take (index = global node id). Halo mode: exchange only each
    shard's first ``halo_size`` rows — the boundary nodes any other shard
    needs — so ICI traffic is O(S·Hb·F) instead of O(S·N_s·F); sender
    indices then address [0, N_s) for local rows and [N_s, N_s + S·Hb) for
    halo rows. Halo-mode graphs must come from ``shard_graph(halo=True)``
    (boundary-first node order), and ``halo_size`` must be the value that
    call returned — models carry it as their ``sp_halo_size`` attribute.
    """
    hb = halo_size
    if hb is None:
        x_all = jax.lax.all_gather(x_local, axis_name, axis=0, tiled=True)
        return jnp.take(x_all, global_idx, axis=0)
    if isinstance(hb, tuple):
        # ring mode: (halo_rows, ring_distance) from shard_graph(halo=True,
        # ring=True). Boundary rows are exchanged ONLY with ring neighbours
        # at distance <= D via ppermute — ICI traffic O(2·D·Hb·F) per shard
        # instead of the all_gather's O(S·Hb·F); sender indices address
        # [N_s + slot·Hb + row] with slot = 2(|d|-1) + (d > 0) for the halo
        # received from ring offset d.
        hb, ring_d = hb
        s = jax.lax.psum(1, axis_name)  # static axis size
        h = x_local[:hb]
        parts = []
        for d in range(1, ring_d + 1):
            # slot 2(d-1): from self-d  (send right: i -> i+d)
            parts.append(jax.lax.ppermute(
                h, axis_name, [(i, (i + d) % s) for i in range(s)]))
            # slot 2(d-1)+1: from self+d  (send left: i -> i-d)
            parts.append(jax.lax.ppermute(
                h, axis_name, [(i, (i - d) % s) for i in range(s)]))
        combined = jnp.concatenate([x_local] + parts, axis=0)
        return jnp.take(combined, global_idx, axis=0)
    halo = jax.lax.all_gather(x_local[:hb], axis_name, axis=0, tiled=True)
    combined = jnp.concatenate([x_local, halo], axis=0)
    return jnp.take(combined, global_idx, axis=0)


def shard_graph(
    graph_np,  # host-side MeshGraph (numpy), UNBATCHED
    num_shards: int,
    halo: bool = False,
    parts=None,  # precomputed RCB parts (list of index arrays) to reuse
    ring: bool = False,  # halo via neighbour ppermute ring (see sp_gather)
) -> Tuple[MeshGraph, np.ndarray]:
    """Reorder + shard a padded MeshGraph for 'sp' execution.

    Returns (sharded graph with leading [S] axis on every array,
    permutation ``order`` mapping new global index -> original index).
    Shapes: nodes [S, N_s, ...] and edges [S, E_s] with receiver indices
    LOCAL to their shard. Sender indices are GLOBAL (owner·N_s + local)
    in full mode, or combined-space ids in halo mode (see
    :func:`sp_gather`); in halo mode each shard's boundary nodes — those
    any remote edge reads — are ordered first and the static halo size is
    returned as a third element (build the model with
    ``sp_halo_size=<that value>``).
    """
    n_valid = int(graph_np.n_node)
    # prefix invariant (core/graph.py): shard_graph slices the first
    # n_edge entries — a blocked-layout graph (ops/tiling.apply_to_graph)
    # interleaves padding per group and must not be passed here
    emask = np.asarray(graph_np.edge_mask)
    if not emask[: int(graph_np.n_edge)].all():
        raise ValueError(
            "shard_graph requires the valid-edges-are-a-prefix invariant; "
            "got a graph with interleaved edge padding (blocked layout?)"
        )
    if parts is None:
        pos = np.asarray(graph_np.pos)[:n_valid]
        parts = rcb_partition(pos, num_shards)

    e_valid_pre = int(graph_np.n_edge)
    send_pre = np.asarray(graph_np.senders)[:e_valid_pre]
    recv_pre = np.asarray(graph_np.receivers)[:e_valid_pre]

    if halo:
        # boundary-first ordering: node u of part s is boundary if some
        # edge owned by another part reads it
        owner0 = np.full(n_valid, -1, np.int64)
        for s, ids in enumerate(parts):
            owner0[ids] = s
        remote_read = np.zeros(n_valid, bool)
        cross = owner0[send_pre] != owner0[recv_pre]
        remote_read[send_pre[cross]] = True
        parts = [
            np.concatenate([ids[remote_read[ids]], ids[~remote_read[ids]]])
            for ids in parts
        ]
        hb = max(int(remote_read[ids].sum()) for ids in parts)
        hb = max(((hb + 7) // 8) * 8, 8)  # sublane-align
    else:
        hb = None
    if ring and not halo:
        raise ValueError("ring=True requires halo=True")

    n_s = padding.bucket_size(max(len(p) for p in parts))
    # new global order: part 0 nodes, pad, part 1 nodes, pad, ...
    order = np.full(num_shards * n_s, -1, dtype=np.int64)
    local_of = np.full(graph_np.num_nodes, -1, dtype=np.int64)
    owner = np.full(graph_np.num_nodes, -1, dtype=np.int64)
    for s, ids in enumerate(parts):
        order[s * n_s : s * n_s + len(ids)] = ids
        local_of[ids] = np.arange(len(ids))
        owner[ids] = s

    def nodes_field(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        out_shape = (num_shards, n_s) + a.shape[1:]
        out = np.full(out_shape, fill, dtype=a.dtype)
        for s, ids in enumerate(parts):
            out[s, : len(ids)] = a[ids]
        return out

    # edges: owned by receiver's shard
    e_valid = int(graph_np.n_edge)
    send = np.asarray(graph_np.senders)[:e_valid]
    recv = np.asarray(graph_np.receivers)[:e_valid]
    e_owner = owner[recv]
    ring_d = None
    if ring:
        deltas = owner[send] - e_owner
        ring_d = max(int(np.abs(deltas).max()) if len(deltas) else 1, 1)
    counts = np.bincount(e_owner, minlength=num_shards)
    e_s = padding.bucket_size(int(counts.max()) if len(counts) else 1)

    send_g = np.zeros((num_shards, e_s), np.int32)  # GLOBAL sender ids
    recv_l = np.zeros((num_shards, e_s), np.int32)  # LOCAL receiver ids
    emask = np.zeros((num_shards, e_s), bool)
    eattr = None
    if graph_np.edge_attr is not None:
        fe = graph_np.edge_attr.shape[-1]
        eattr = np.zeros((num_shards, e_s, fe), np.float32)
    for s in range(num_shards):
        sel = np.where(e_owner == s)[0]
        k = len(sel)
        su = send[sel]
        if halo and ring_d is not None:
            is_local = owner[su] == s
            delta = owner[su] - s
            slot = (np.abs(delta) - 1) * 2 + (delta > 0).astype(np.int64)
            send_g[s, :k] = np.where(
                is_local, local_of[su], n_s + slot * hb + local_of[su]
            )
        elif halo:
            is_local = owner[su] == s
            # local rows address [0, N_s); halo rows address
            # N_s + owner·Hb + boundary_pos (boundary nodes are the first
            # rows of their shard, so boundary_pos == local index)
            send_g[s, :k] = np.where(
                is_local, local_of[su], n_s + owner[su] * hb + local_of[su]
            )
        else:
            send_g[s, :k] = owner[su] * n_s + local_of[su]
        recv_l[s, :k] = local_of[recv[sel]]
        emask[s, :k] = True
        if eattr is not None:
            eattr[s, :k] = np.asarray(graph_np.edge_attr)[sel]

    node_mask = np.zeros((num_shards, n_s), bool)
    for s, ids in enumerate(parts):
        node_mask[s, : len(ids)] = True

    sharded = MeshGraph(
        x=nodes_field(graph_np.x),
        pos=nodes_field(graph_np.pos),
        node_type=nodes_field(graph_np.node_type, fill=PAD_NODE_TYPE),
        node_mask=node_mask,
        senders=send_g,
        receivers=recv_l,
        edge_mask=emask,
        edge_attr=eattr,
        y=nodes_field(graph_np.y),
        prev=nodes_field(graph_np.prev),
        next_data=nodes_field(graph_np.next_data),
        deselected=nodes_field(graph_np.deselected),
        phi=nodes_field(graph_np.phi),
        n_node=np.array([len(p) for p in parts], np.int32),
        n_edge=counts.astype(np.int32),
        traj_index=np.repeat(np.asarray(graph_np.traj_index)[None], num_shards),
        time=np.repeat(np.asarray(graph_np.time)[None], num_shards),
    )
    if halo and ring_d is not None:
        # opaque to the models: pass the tuple straight into sp_halo_size
        return sharded, order, (hb, ring_d)
    if halo:
        return sharded, order, hb
    return sharded, order


def make_sp_forward(model, mesh: Mesh, axis_name: str = "sp"):
    """Jit a node-sharded forward: (params, sharded_graph) -> [S, N_s, out].

    ``model`` must be built with ``sp_axis_name=axis_name`` (its
    GraphNetBlocks then gather sender features with :func:`sp_gather`).
    Params are replicated; graph leaves are sharded on their leading [S]
    axis. For halo-limited exchange, build the model with
    ``sp_halo_size=<value returned by shard_graph(halo=True)>``.
    """

    def local_fn(params, graph: MeshGraph):
        g = jax.tree.map(lambda a: a[0] if a is not None else None, graph)
        out = model.apply(params, g)
        return out[None]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)


def unshard_nodes(arr: np.ndarray, order: np.ndarray, num_orig: int) -> np.ndarray:
    """[S, N_s, F] sharded node array -> [num_orig, F] original order."""
    flat = np.asarray(arr).reshape(-1, arr.shape[-1])
    out = np.zeros((num_orig,) + flat.shape[1:], flat.dtype)
    valid = order >= 0
    out[order[valid]] = flat[valid]
    return out


# ----------------------------------------------------------------------
# sp TRAINING: loss + grads through the halo/full ICI gathers
# ----------------------------------------------------------------------

def shard_trajectory(frames_np, num_shards: int, halo: bool = False):
    """Shard every frame of a stacked trajectory ([T, ...] MeshGraph).

    The RCB partition is computed ONCE from frame 0's positions and passed
    to every frame's shard_graph call, so the sharded trajectory is
    [S, T, ...] with consistent node order even if positions drift over
    time (deforming meshes). Returns (sharded, order[, halo_size])."""
    import dataclasses as _dc

    t_len = np.asarray(frames_np.x).shape[0]

    def frame(i):
        return jax.tree.map(
            lambda a: None if a is None else np.asarray(a)[i], frames_np
        )

    f0 = frame(0)
    parts0 = rcb_partition(
        np.asarray(f0.pos)[: int(f0.n_node)], num_shards
    )
    out = [
        shard_graph(frame(i), num_shards, halo=halo, parts=parts0)
        for i in range(t_len)
    ]
    order = out[0][1]
    hb = out[0][2] if halo else None
    per_frame = [o[0] for o in out]

    def stack(*leaves):
        if leaves[0] is None:
            return None
        return np.stack([np.asarray(l) for l in leaves], axis=1)  # [S, T, ...]

    sharded = jax.tree.map(stack, *per_frame, is_leaf=lambda x: x is None)
    if halo:
        return sharded, order, hb
    return sharded, order


def make_sp_mean(axis_name: str):
    """psum-ing replacement for training/loss._masked_mean: same shape
    contract ([... ,N, C...] errors, [..., N] mask), global numerator and
    denominator reduced over the sp axis BEFORE the divide, so every term
    of every loss matches the unsharded value exactly (and so do its
    gradients under vma-tracked AD)."""

    from graph_physics_tpu.training.loss import masked_num_den

    def mean(errors, mask):
        num, den = masked_num_den(errors, mask)
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
        return num / jnp.maximum(den, 1.0)

    return mean


def sp_gradient_fd(graph, field, axis_name: str,
                   halo_size: Optional[int] = None) -> jnp.ndarray:
    """Finite-difference gradient on an sp-sharded graph.

    Same math as ops/voperators.gradient_fd (inverse-square-distance
    weighted edge differences, reference vectorial_operators.py:81-128),
    with the SENDER reads crossing the ICI through the same
    :func:`sp_gather` seam the model uses — edges are receiver-owned, so
    the scatter and the per-node weight normalization stay local.
    """
    pos = graph.pos.astype(jnp.float32)
    f = field.astype(jnp.float32)
    n = pos.shape[0]
    pos_s = sp_gather(pos, graph.senders, axis_name, halo_size)
    f_s = sp_gather(f, graph.senders, axis_name, halo_size)
    dx = pos_s - pos[graph.receivers]  # [E, D]
    du = f_s - f[graph.receivers]  # [E, F]
    dist2 = jnp.sum(dx * dx, axis=-1)
    eps = 1e-8
    w = 1.0 / (dist2 + eps)
    g_e = du[:, :, None] * dx[:, None, :] * (w * w)[:, None, None]
    from graph_physics_tpu.ops import segment

    grad = segment.segment_sum(g_e, graph.receivers, n, mask=graph.edge_mask)
    w_sum = segment.segment_sum(w, graph.receivers, n, mask=graph.edge_mask)
    return grad / (w_sum[:, None, None] + eps)


def _sp_masked_l2(graph, net_out, target, mask_types, axis_name: str):
    """Global masked MSE under shard_map: the SAME num/den computation as
    the single-device l2_loss (training/loss.masked_l2_parts — single
    source of the masking semantics), psum-ed across shards before the
    divide so value and gradients match the unsharded loss exactly."""
    from graph_physics_tpu.training.loss import masked_l2_parts

    num, den = masked_l2_parts(
        graph, net_out, target, mask_types, graph.deselected
    )
    num = jax.lax.psum(num, axis_name)
    den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def make_sp_train_step(
    simulator,
    optimizer,
    mesh: Mesh,
    axis_name: str = "sp",
    mask_types=None,
    loss_fn=None,
    gradient_method: str = "finite_diff",
    dp_axis_name: Optional[str] = None,
):
    """Jitted node-sharded train step: ``(state, sharded_graph, rng) ->
    (state, metrics)`` — the TPU-native upgrade of the reference's METIS
    sub-mesh training (SURVEY.md §2.4): ONE large mesh per step, nodes
    sharded over 'sp', gradients flowing through the ICI sender gathers.

    Contract: ``simulator`` built with ``axis_name=axis_name`` (normalizer
    partial sums psum to global statistics) and its model with
    ``sp_axis_name=axis_name`` (+ ``sp_halo_size`` for halo graphs);
    ``sharded_graph`` from :func:`shard_graph` with a leading [S] axis.
    ``loss_fn`` defaults to the masked L2 (lightning_module.py:304-312);
    a training/loss.MultiLoss runs its physics terms sharded too — the FD
    gradients cross shards through :func:`sp_gradient_fd` and every term
    reduces through :func:`make_sp_mean` (``least_squares`` needs the
    face partition and is not supported under sp). Gradients are psum-ed
    so every shard applies the identical AdamW update. Exact parity with
    the single-device step: tests/test_parallel.py.

    ``dp_axis_name`` enables a 2-D dp×sp mesh: the input carries a leading
    batch axis sharded over dp (one graph per dp replica), nodes sharded
    over sp within each replica; the loss is pmean-ed over dp (mean over
    the batch) and the AD transposes of pmean/psum leave every device with
    the identical total gradient. Build the simulator with
    ``axis_name=(dp_axis_name, sp_axis_name)`` so normalizer statistics
    are global over BOTH axes.
    """
    import optax

    from graph_physics_tpu.training import loss as loss_lib
    from graph_physics_tpu.training.loss import LossInputs, MultiLoss
    from graph_physics_tpu.training.step import TrainState

    mt = tuple(
        int(m) for m in (mask_types or loss_lib.DEFAULT_MASK_TYPES)
    )
    is_multi = isinstance(loss_fn, MultiLoss)
    if loss_fn is not None and not is_multi:
        from graph_physics_tpu.training.loss import LossType

        if loss_fn is not LossType.L2LOSS:
            raise ValueError(
                "make_sp_train_step supports loss_fn=None/LossType.L2LOSS "
                f"(masked L2) or a MultiLoss; got {loss_fn!r}"
            )
    if is_multi and loss_fn.needs_physical and gradient_method != "finite_diff":
        raise ValueError(
            "sp physics losses support gradient_method='finite_diff' only "
            "(least_squares needs a face partition)"
        )
    halo_size = getattr(simulator.model, "sp_halo_size", None)
    sp_mean = make_sp_mean(axis_name)

    def local_body(state, graph, rng):
        strip = (lambda a: a[0, 0]) if dp_axis_name else (lambda a: a[0])
        g = jax.tree.map(lambda a: strip(a) if a is not None else None, graph)

        def compute_loss(params, sim_state):
            g_in, target_norm, pre_t, new_state = simulator.prepare(
                sim_state, g, is_training=True
            )
            net_out = simulator.apply_model(params, g_in)
            if is_multi:
                inp = LossInputs(
                    graph=g, target=target_norm, network_output=net_out,
                    deselected=g.deselected,
                )
                if loss_fn.needs_physical:
                    out_phys = simulator.build_outputs_from_pre(
                        new_state, net_out, pre_t)
                    tgt_phys = simulator.build_outputs_from_pre(
                        new_state, target_norm, pre_t)
                    inp = inp.replace(
                        network_output_physical=out_phys,
                        target_physical=tgt_phys,
                        network_output_gradient=sp_gradient_fd(
                            g, out_phys, axis_name, halo_size),
                        target_gradient=sp_gradient_fd(
                            g, tgt_phys, axis_name, halo_size),
                    )
                loss, _terms = loss_fn(
                    inp, mask_types=mt, gradient_method=None,
                    return_all_losses=True, mean_fn=sp_mean,
                )
            else:
                loss = _sp_masked_l2(g, net_out, target_norm, mt, axis_name)
            if dp_axis_name is not None:
                loss = jax.lax.pmean(loss, dp_axis_name)
            return loss, new_state

        (loss, new_sim_state), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params, state.sim_state)
        # no explicit grad psum: under check_vma=True replication tracking
        # the AD transposes of the loss psum / sender all_gather already
        # leave every shard holding the identical total gradient
        # (parity-tested vs single device in tests/test_parallel.py)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            sim_state=new_sim_state,
            step=state.step + 1,
        )
        return new_state, metrics

    graph_spec = (
        P(dp_axis_name, axis_name) if dp_axis_name else P(axis_name)
    )
    sharded = jax.shard_map(
        local_body,
        mesh=mesh,
        in_specs=(P(), graph_spec, P()),
        out_specs=(P(), P()),
        # vma tracking REQUIRED for sound AD through the psums (with
        # check_vma=False the psum transpose double-counts shards)
        check_vma=True,
    )
    return jax.jit(sharded)


def make_sp_rollout(
    simulator,
    mesh: Mesh,
    axis_name: str = "sp",
    previous_data_slice=None,
    mask_types=None,
):
    """Node-sharded autoregressive rollout: ``(params, sim_state,
    sharded_frames[S, T, ...]) -> (predictions [S, T, N_s, F], rmse)``.

    Same state machine as training/rollout.make_rollout_fn (write-back of
    the predicted output slice + previous-data delta, Dirichlet BC
    overwrite from ground truth, lightning_module.py:375-409) with every
    per-node op local to its shard; only the model's sender gathers and
    the RMSE reduction cross the ICI.
    """
    from graph_physics_tpu.training import loss as loss_lib
    from graph_physics_tpu.training.rollout import bc_mask

    ois, oie = simulator.output_index_start, simulator.output_index_end
    mt = tuple(int(m) for m in (mask_types or loss_lib.DEFAULT_MASK_TYPES))

    def local_rollout(params, sim_state, frames):
        f = jax.tree.map(lambda a: a[0] if a is not None else None, frames)

        def body(carry, frame):
            last_pred, last_prev = carry
            x = frame.x
            x = x.at[:, ois:oie].set(last_pred)
            if previous_data_slice is not None:
                ps, pe = previous_data_slice
                x = x.at[:, ps:pe].set(last_prev)
            g = frame.replace(x=x)
            out = simulator.forward(params, sim_state, g, is_training=False)
            predicted = out.outputs
            target = frame.y
            mask = bc_mask(g)[:, None]
            predicted = jnp.where(mask, target, predicted)
            new_prev = predicted - x[:, ois:oie]

            valid = g.node_mask.astype(jnp.float32)[:, None]
            sq_sum = jnp.sum((predicted - target) ** 2 * valid)
            count = jnp.sum(valid) * predicted.shape[-1]
            return (predicted, new_prev), (predicted, sq_sum, count)

        init_pred = f.x[0, :, ois:oie].astype(jnp.float32)
        if previous_data_slice is not None:
            ps, pe = previous_data_slice
            init_prev = f.x[0, :, ps:pe].astype(jnp.float32)
        else:
            init_prev = init_pred
        _, (preds, sq_sums, counts) = jax.lax.scan(body, (init_pred, init_prev), f)
        rmse = jnp.sqrt(
            jax.lax.psum(jnp.sum(sq_sums), axis_name)
            / jnp.maximum(jax.lax.psum(jnp.sum(counts), axis_name), 1.0)
        )
        return preds[None], rmse

    sharded = jax.shard_map(
        local_rollout,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=(P(axis_name), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
