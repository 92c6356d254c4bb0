"""Fused Pallas edge attention: fwd + grad parity vs ops/edge_attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import edge_attention as ea
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_edge_attention import fused_edge_attention


def _setup(nx=14, ny=10, b=2, h=4, dh=16, seed=0):
    traj = synthetic.make_trajectory(nx, ny, num_steps=2)
    pos = traj["mesh_pos"][0]
    senders, receivers = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
    t = tiling_lib.build_edge_tiling(senders, receivers, len(pos), node_block=128)
    assert t is not None
    n = t.num_nodes
    key = jax.random.PRNGKey(seed)
    q = jax.random.normal(key, (n, b, h, dh), jnp.float32) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, b, h, dh)) * 0.5
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, b, h, dh)) * 0.5
    return t, n, senders, receivers, q, k, v


def _xla_ref(q, k, v, senders, receivers):
    # bf16-faithful mirror of the kernel's dtype flow
    return ea.edge_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        jnp.asarray(senders), jnp.asarray(receivers),
        edge_mask=jnp.ones(senders.shape[0], bool),
    )


def test_fused_attention_forward_matches():
    t, n, senders, receivers, q, k, v = _setup()
    out_ref = _xla_ref(q, k, v, senders, receivers)
    out_f = fused_edge_attention(q, k, v, t, interpret=True)
    a = np.asarray(out_ref, np.float32)
    c = np.asarray(out_f, np.float32)
    n_real = int(senders.max()) + 1  # all mesh nodes touched by edges
    np.testing.assert_allclose(c[:n_real], a[:n_real], rtol=0.06, atol=0.03)


def test_fused_attention_isolated_nodes_zero():
    """Receivers with no incoming edges return zeros (XLA-path parity)."""
    t, n, senders, receivers, q, k, v = _setup()
    out_f = fused_edge_attention(q, k, v, t, interpret=True)
    has_in = np.zeros(n, bool)
    has_in[np.asarray(receivers)] = True
    if (~has_in).any():
        np.testing.assert_array_equal(
            np.asarray(out_f)[~has_in], 0.0
        )


def test_fused_attention_grads_match():
    t, n, senders, receivers, q, k, v = _setup(nx=12, ny=8)
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(
            _xla_ref(q, k, v, senders, receivers).astype(jnp.float32) * cot
        )

    def loss_fused(q, k, v):
        return jnp.sum(
            fused_edge_attention(q, k, v, t, interpret=True).astype(
                jnp.float32
            ) * cot
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


def test_etd_fused_attention_matches_xla():
    """EncodeTransformDecode with edge_tiling (fused attention) vs the
    plain XLA path, same params, packed bf16 batch."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.ops.tiling import apply_to_graph
    from tests.helpers import tiny_graph

    b = 2
    g = tiny_graph(nx=14, ny=10)
    t = tiling_lib.build_edge_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
        edge_mask=np.asarray(g.edge_mask), node_block=128)
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
    gt = gt.replace(x=x_t)

    kwargs = dict(
        message_passing_num=2, node_input_size=4, output_size=2,
        hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
    )
    m_xla = EncodeTransformDecode(**kwargs)
    m_fused = EncodeTransformDecode(edge_tiling=t, **kwargs)
    params = m_xla.init(jax.random.fold_in(key, 1), gp)
    out_xla = m_xla.apply(params, gp)
    out_fused = m_fused.apply(params, gt)

    n_real = int(g.n_node)
    a = np.asarray(out_xla, np.float32)[:n_real]
    c = np.asarray(out_fused, np.float32)[:n_real]
    np.testing.assert_allclose(c, a, rtol=0.1, atol=0.1)

    # grads flow through the fused attention to q/k/v projections
    def loss(p):
        return jnp.sum(m_fused.apply(p, gt).astype(jnp.float32)[:n_real] ** 2)

    grads = jax.grad(loss)(params)
    kp = grads["params"]["block_0"]["attention"]["k_proj"]["kernel"]
    assert float(np.abs(np.asarray(kp)).max()) > 0
