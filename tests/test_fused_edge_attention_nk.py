"""Uniform-degree (NK) fused edge attention: layout + fwd/grad parity.

Mirrors tests/test_fused_edge_attention.py against the same XLA reference
(ops/edge_attention) and additionally cross-checks the two fused kernels
against each other on the identical graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import edge_attention as ea
from graph_physics_tpu.ops.fused_edge_attention_nk import (
    build_nk_tiling,
    fused_edge_attention_nk,
)


def _setup(nx=14, ny=10, b=2, h=4, dh=16, seed=0):
    traj = synthetic.make_trajectory(nx, ny, num_steps=2)
    pos = traj["mesh_pos"][0]
    senders, receivers = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
    t = build_nk_tiling(senders, receivers, len(pos), node_block=128)
    assert t is not None
    n = t.num_nodes
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (n, b, h, dh), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, b, h, dh)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, b, h, dh)) * 0.5
    return t, n, senders, receivers, q, k, v


def _xla_ref(q, k, v, senders, receivers):
    return ea.edge_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        jnp.asarray(senders), jnp.asarray(receivers),
        edge_mask=jnp.ones(senders.shape[0], bool),
    )


def test_nk_tiling_layout():
    """Every edge lands in exactly one slot of its receiver's K run, with
    the correct window-local sender index."""
    t, n, senders, receivers, *_ = _setup()
    nb, kk, wu = t.node_block, t.k_slots, t.window_unit
    deg = np.bincount(np.asarray(receivers), minlength=n)
    assert kk == int(deg.max())
    seen = 0
    for g in range(t.num_groups):
        units = t.win_start[g]
        for slot in range(t.slots):
            e = t.perm[g * t.slots + slot]
            if e < 0:
                assert t.sidx[g, slot] == t.window_blocks * wu
                continue
            seen += 1
            r_local = slot % nb
            assert receivers[e] == g * nb + r_local
            lidx = t.sidx[g, slot]
            unit = units[lidx // wu]
            assert senders[e] == unit * wu + lidx % wu
    assert seen == len(senders)


def test_nk_forward_matches_xla():
    t, n, senders, receivers, q, k, v = _setup()
    out_ref = _xla_ref(q, k, v, senders, receivers)
    out_f = fused_edge_attention_nk(q, k, v, t, interpret=True)
    a = np.asarray(out_ref, np.float32)
    c = np.asarray(out_f, np.float32)
    n_real = int(senders.max()) + 1
    np.testing.assert_allclose(c[:n_real], a[:n_real], rtol=0.06, atol=0.03)
    # empty receivers return zeros
    has_in = np.zeros(n, bool)
    has_in[np.asarray(receivers)] = True
    if (~has_in).any():
        np.testing.assert_array_equal(np.asarray(out_f)[~has_in], 0.0)


def test_nk_matches_blocked_csr_kernel():
    """The two fused kernels agree bit-for-bit-ish on the same graph."""
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.ops.fused_edge_attention import fused_edge_attention

    t_nk, n, senders, receivers, q, k, v = _setup(nx=12, ny=9, seed=3)
    t_csr = tiling_lib.build_edge_tiling(senders, receivers,
                                         int(senders.max()) + 1,
                                         node_block=128)
    assert t_csr is not None and t_csr.num_nodes == n
    out_nk = fused_edge_attention_nk(q, k, v, t_nk, interpret=True)
    out_csr = fused_edge_attention(q, k, v, t_csr, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_nk, np.float32), np.asarray(out_csr, np.float32),
        rtol=0.03, atol=0.02,
    )


def test_nk_grads_match():
    t, n, senders, receivers, q, k, v = _setup(nx=12, ny=8, seed=5)
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(
            _xla_ref(q, k, v, senders, receivers).astype(jnp.float32) * cot
        )

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_edge_attention_nk(q, k, v, t, interpret=True).astype(
                jnp.float32) * cot
        )

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    v_fus, g_fus = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=0.03)
    for a, c, name in zip(g_ref, g_fus, ["dq", "dk", "dv"]):
        a = np.asarray(a, np.float32)
        c = np.asarray(c, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                   err_msg=name)


def test_etd_nk_attention_matches_xla():
    """EncodeTransformDecode with edge_tiling_nk (NK attention) vs the
    plain XLA path, same params, packed bf16 batch."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.ops.tiling import apply_to_graph
    from tests.helpers import tiny_graph

    b = 2
    g = tiny_graph(nx=14, ny=10)
    t = tiling_lib.build_edge_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
        edge_mask=np.asarray(g.edge_mask), node_block=128)
    t_nk = build_nk_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
        edge_mask=np.asarray(g.edge_mask), node_block=128)
    assert t_nk is not None and t_nk.num_nodes == t.num_nodes
    gt = apply_to_graph(g, t)

    key = jax.random.PRNGKey(4)
    n0 = g.x.shape[0]
    x0 = jax.random.normal(key, (n0, b, 4), jnp.float32) * 0.5
    gp = jax.tree.map(jnp.asarray, g)
    gp = gp.replace(x=jnp.asarray(x0))
    n_t = t.num_nodes
    x_t = jnp.zeros((n_t, b, 4))
    x_t = x_t.at[: min(n0, n_t)].set(x0[: min(n0, n_t)])
    gt = jax.tree.map(jnp.asarray, gt)
    gt = gt.replace(x=x_t, tiling_idx=None)  # static-topology dispatch

    kwargs = dict(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
    )
    m_xla = EncodeTransformDecode(**kwargs)
    m_nk = EncodeTransformDecode(edge_tiling=t, edge_tiling_nk=t_nk, **kwargs)
    params = m_xla.init(jax.random.fold_in(key, 1), gp)
    out_xla = m_xla.apply(params, gp)
    out_nk = m_nk.apply(params, gt)

    n_real = int(g.n_node)
    a = np.asarray(out_xla, np.float32)[:n_real]
    c = np.asarray(out_nk, np.float32)[:n_real]
    np.testing.assert_allclose(c, a, rtol=0.1, atol=0.1)

    def loss(p):
        return jnp.sum(m_nk.apply(p, gt).astype(jnp.float32)[:n_real] ** 2)

    grads = jax.grad(loss)(params)
    kp = grads["params"]["block_0"]["attention"]["k_proj"]["kernel"]
    assert float(np.abs(np.asarray(kp)).max()) > 0


def test_nk_runtime_indices_bucket_sharing():
    """The fused manager with build_nk=True rides NK runtime indices on
    the graph: same-bucket topologies share ONE step key, and a model
    cloned for one topology's geometry computes the other topology
    correctly through the runtime (win_start, sidx) arrays."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from tests.test_fused_buckets import _jittered_mesh

    mgr = FusedTopologyManager(build_nk=True)
    graphs = [_jittered_mesh(s) for s in range(4)]
    frames = [mgr.transform_frame(g) for g in graphs]
    assert all(f.tiling_idx_nk is not None for f in frames)
    keys = {mgr.key_for(f) for f in frames}
    assert len(keys) == 1 and "xla" not in keys
    (key,) = keys
    assert key[1] is not None, "key must include the NK geometry"

    b = 2
    t_geo = mgr._batch_tiling(frames[0])
    nk_geo = mgr._batch_nk_tiling(frames[0])
    kwargs = dict(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
    )
    m_xla = EncodeTransformDecode(**kwargs)
    m_nk = EncodeTransformDecode(edge_tiling=t_geo, edge_tiling_nk=nk_geo,
                                 **kwargs)

    def packed(f, seed):
        x = jax.random.normal(jax.random.PRNGKey(seed),
                              (f.x.shape[0], b, 4), jnp.float32) * 0.5
        return jax.tree.map(jnp.asarray, f).replace(x=x)

    f0 = packed(frames[0], 0)
    params = m_xla.init(jax.random.PRNGKey(1), f0)
    for i, fr in enumerate(frames[:2]):
        fp = packed(fr, 10 + i)
        out_nk = m_nk.apply(params, fp)
        out_ref = m_xla.apply(params, fp)
        n_real = int(fr.n_node)
        np.testing.assert_allclose(
            np.asarray(out_nk, np.float32)[:n_real],
            np.asarray(out_ref, np.float32)[:n_real],
            rtol=0.1, atol=0.1, err_msg=f"topology {i}",
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nk_tiling_property_random_graphs(seed):
    """Random sparse graphs (uneven degrees, empty receivers, multiple
    node blocks, RCM order): the layout invariants hold and the kernel
    matches the XLA reference."""
    from graph_physics_tpu.ops import tiling as tiling_lib

    rng = np.random.default_rng(seed)
    n = int(rng.integers(150, 300))
    e = int(rng.integers(2 * n, 5 * n))
    senders = rng.integers(0, n, e)
    # degree-bounded receivers: draw with replacement then cap via unique
    receivers = rng.integers(0, n, e)
    perm = tiling_lib.rcm_order(senders, receivers, n)
    inv = np.argsort(perm)
    senders, receivers = inv[senders], inv[receivers]
    order = np.argsort(receivers, kind="stable")
    senders, receivers = senders[order], receivers[order]

    t = build_nk_tiling(senders, receivers, n, node_block=128,
                        max_row_inflation=8.0)
    if t is None:
        pytest.skip("random graph too degree-skewed for NK")
    # invariant: every edge in exactly one slot, senders/receivers correct
    deg = np.bincount(receivers, minlength=t.num_nodes)
    assert t.k_slots >= int(deg.max())
    filled = t.perm[t.perm >= 0]
    assert len(filled) == e and len(set(filled.tolist())) == e
    nb, wu = t.node_block, t.window_unit
    for g in range(t.num_groups):
        units = t.win_start[g]
        sl = t.perm[g * t.slots:(g + 1) * t.slots]
        for slot in np.nonzero(sl >= 0)[0]:
            eid = sl[slot]
            assert receivers[eid] == g * nb + slot % nb
            lidx = t.sidx[g, slot]
            assert senders[eid] == units[lidx // wu] * wu + lidx % wu

    b, h, dh = 1, 2, 64  # total lanes 128
    key = jax.random.PRNGKey(seed + 50)
    q = jax.random.normal(key, (t.num_nodes, b, h, dh), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape) * 0.5
    out = fused_edge_attention_nk(q, k, v, t, interpret=True)
    ref = _xla_ref(q, k, v, senders, receivers)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:n], np.asarray(ref, np.float32)[:n],
        rtol=0.06, atol=0.03,
    )


def test_nk_indices_survive_pack_and_reach_step_clone():
    """--fused_attn_nk end to end on the host side: transform_frame →
    stack → pack() must KEEP tiling_idx_nk (regression: pack used to
    rebuild the MeshGraph without it, silently disabling NK in training),
    and step_for must clone edge_tiling_nk onto the model."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.fused import FusedTopologyManager
    from graph_physics_tpu.training.packed import pack
    from tests.test_fused_buckets import _jittered_mesh

    mgr = FusedTopologyManager(build_nk=True)
    frame = mgr.transform_frame(_jittered_mesh(0))
    assert frame.tiling_idx_nk is not None
    batch = pack(jax.tree.map(lambda a: np.stack([np.asarray(a)] * 2), frame))
    assert batch.tiling_idx_nk is not None, "pack() dropped tiling_idx_nk"

    sim = Simulator(
        node_input_size=2 + 9, edge_input_size=0, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=EncodeTransformDecode(
            message_passing_num=1, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
        ),
    )
    clone, _step = mgr.step_for(batch, sim, lambda s: (lambda b: b))
    assert clone.model.edge_tiling is not None
    assert clone.model.edge_tiling_nk is not None, (
        "step clone must carry the NK geometry"
    )
    key = mgr.key_for(batch, base_sim=sim)
    assert key != "xla" and key[1] is not None


def test_nk_rejects_degree_skew():
    """A hub node forces K to the hub degree; the builder bails out."""
    hub_edges = 64
    senders = np.arange(hub_edges, dtype=np.int64) + 1
    receivers = np.zeros(hub_edges, np.int64)
    # plus a sparse ring so other nodes have degree 1
    ring_s = np.arange(1, 65, dtype=np.int64)
    ring_r = ring_s % 64 + 1
    s = np.concatenate([senders, ring_s])
    r = np.concatenate([receivers, ring_r])
    t = build_nk_tiling(s, r, 65, node_block=128, max_row_inflation=2.0)
    assert t is None


@pytest.mark.parametrize("nb", [64, 128])
def test_nk_node_block_variants(nb):
    """The NK kernel is node_block-agnostic: nb=64 (the bench's
    gather-flop lever — 0.75x window gather/scatter work at 2x grid
    steps, scripts/flops_model.py) matches the XLA reference in values
    AND gradients."""
    traj = synthetic.make_trajectory(14, 10, num_steps=2)
    pos = traj["mesh_pos"][0]
    senders, receivers = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
    t = build_nk_tiling(senders, receivers, len(pos), node_block=nb)
    assert t is not None and t.node_block == nb
    n = t.num_nodes
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (n, 2, 4, 16), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape) * 0.5
    cot = jax.random.normal(jax.random.fold_in(key, 3), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, senders, receivers)[: len(pos)]
                       .astype(jnp.float32) * cot[: len(pos)])

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_edge_attention_nk(q, k, v, t, interpret=True)[: len(pos)]
            .astype(jnp.float32) * cot[: len(pos)])

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    v_fus, g_fus = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=0.03)
    for a, c, name in zip(g_ref, g_fus, ["dq", "dk", "dv"]):
        a = np.asarray(a, np.float32)[: len(pos)]
        c = np.asarray(c, np.float32)[: len(pos)]
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                   err_msg=name)
