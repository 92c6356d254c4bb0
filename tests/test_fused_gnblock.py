"""Fused Pallas GraphNetBlock: tiling invariants + fwd/bwd parity.

Parity is checked three ways:
  * tiling round-trip (blocked layout vs original edge arrays);
  * fused kernel (interpret mode on CPU) vs the pure-JAX blocked reference;
  * fused kernel vs the production ``GraphNetBlock`` (models/layers.py)
    applied to the same packed graph — the contract the fast path swaps in
    for (reference hot loop: graphphysics/models/layers.py:1015-1102).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_gnblock import blocked_reference, fused_gn_block


def _toy_graph(nx=20, ny=12):
    traj = synthetic.make_trajectory(nx, ny, num_steps=2)
    pos = traj["mesh_pos"][0]
    cells = traj["cells"][0]
    ei = mesh_lib.faces_to_edges(cells, len(pos))
    return pos, ei


def _params(key, f, n_in_parts, n_layers=4, layer_norm=True):
    ks = jax.random.split(key, 2 * n_layers + 1)
    p = {}
    fan_in = n_in_parts * f
    for i in range(n_layers):
        p[f"Dense_{i}"] = {
            "kernel": jax.random.normal(ks[2 * i], (fan_in, f), jnp.float32)
            * (1.0 / np.sqrt(fan_in)),
            "bias": jax.random.normal(ks[2 * i + 1], (f,), jnp.float32) * 0.1,
        }
        fan_in = f
    if layer_norm:
        p["RMSNorm_0"] = {"scale": 1.0 + 0.1 * jax.random.normal(ks[-1], (f,))}
    return p


def test_tiling_roundtrip():
    pos, ei = _toy_graph()
    n = len(pos)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, n, node_block=128)
    assert t is not None
    e = senders.shape[0]
    vals = np.random.default_rng(0).normal(size=(e, 3)).astype(np.float32)
    blocked = t.expand_edges(vals)
    back = t.reduce_edges(blocked, e)
    np.testing.assert_array_equal(back, vals)
    # every valid slot's sender/receiver reconstructs the original edge
    gids = np.repeat(np.arange(t.num_groups), t.edges_per_block)
    valid = t.perm >= 0
    glob_r = gids * t.node_block + t.ridx.reshape(-1)
    glob_s = t.win_start[gids] * t.node_block + t.sidx.reshape(-1)
    np.testing.assert_array_equal(glob_r[valid], receivers[t.perm[valid]])
    np.testing.assert_array_equal(glob_s[valid], senders[t.perm[valid]])


def test_tiling_rejects_wide_windows():
    # a random (non-local) graph on many nodes must exceed the window cap
    rng = np.random.default_rng(0)
    n = 4096
    senders = rng.integers(0, n, 8000)
    receivers = rng.integers(0, n, 8000)
    t = tiling_lib.build_edge_tiling(senders, receivers, n, max_window_blocks=4)
    assert t is None


def test_rcm_reduces_bandwidth():
    pos, ei = _toy_graph(nx=30, ny=20)
    n = len(pos)
    senders, receivers = ei
    rng = np.random.default_rng(1)
    shuf = rng.permutation(n)  # scramble node order
    inv = np.argsort(shuf)
    s2, r2 = inv[senders], inv[receivers]
    perm = tiling_lib.rcm_order(s2, r2, n)
    inv_p = np.argsort(perm)
    s3, r3 = inv_p[s2], inv_p[r2]
    bw_before = int(np.abs(s2 - r2).max())
    bw_after = int(np.abs(s3 - r3).max())
    assert bw_after < bw_before
    assert tiling_lib.build_edge_tiling(s3, r3, n, max_window_blocks=4) is not None


@pytest.mark.parametrize("activation", ["relu", "silu"])
def test_fused_block_matches_reference(activation):
    f, b = 32, 4  # B*F = 128 = one lane chunk
    pos, ei = _toy_graph()
    n_real = len(pos)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, n_real, node_block=128)
    assert t is not None
    n = t.num_nodes

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_orig = jax.random.normal(jax.random.fold_in(key, 1),
                               (senders.shape[0], b, f), jnp.float32) * 0.5
    e_blocked = jnp.asarray(t.expand_edges(np.asarray(e_orig)))

    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)

    x_ref, e_ref = blocked_reference(x, e_blocked, ep, np_, t,
                                     activation=activation,
                                     compute_dtype=jnp.bfloat16)
    x_f, e_f = fused_gn_block(x.astype(jnp.bfloat16),
                              e_blocked.astype(jnp.bfloat16), ep, np_, t,
                              activation=activation, interpret=True)
    # bf16-faithful reference: residual noise = the kernel's bf16 bias-add/
    # activation flow vs the reference's fp32 one (one rounding step apart)
    np.testing.assert_allclose(np.asarray(x_f, np.float32),
                               np.asarray(x_ref, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(e_f, np.float32),
                               np.asarray(e_ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_block_gradients_match():
    f, b = 32, 4
    pos, ei = _toy_graph(nx=12, ny=8)
    n_real = len(pos)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, n_real, node_block=128)
    n = t.num_nodes

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_blocked = jnp.asarray(
        t.expand_edges(
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, 1), (senders.shape[0], b, f)
                )
            )
            * 0.5
        )
    )
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)

    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))
    cot_e = jax.random.normal(jax.random.fold_in(key, 5), e_blocked.shape)

    def loss_ref(x, e, ep, np_):
        xo, eo = blocked_reference(x, e, ep, np_, t,
                                   compute_dtype=jnp.bfloat16)
        return jnp.sum(xo.astype(jnp.float32) * cot_x) + jnp.sum(
            eo.astype(jnp.float32) * cot_e
        )

    def loss_fused(x, e, ep, np_):
        xo, eo = fused_gn_block(x, e, ep, np_, t, interpret=True)
        return jnp.sum(xo.astype(jnp.float32) * cot_x) + jnp.sum(
            eo.astype(jnp.float32) * cot_e
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, e_blocked, ep, np_)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, e_blocked, ep, np_)

    for gr, gf, name in [
        (g_ref[0], g_fus[0], "dx"),
        (g_ref[1], g_fus[1], "de"),
    ]:
        gr, gf = np.asarray(gr, np.float32), np.asarray(gf, np.float32)
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, gr / scale, atol=0.03,
                                   err_msg=name)

    for tree_r, tree_f, name in [(g_ref[2], g_fus[2], "edge_w"),
                                 (g_ref[3], g_fus[3], "node_w")]:
        fr = jax.tree.leaves(tree_r)
        ff = jax.tree.leaves(tree_f)
        for a, c in zip(fr, ff):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.03,
                                       err_msg=name)


def test_fused_matches_production_block():
    """Fused path vs models.layers.GraphNetBlock on the same packed graph."""
    from graph_physics_tpu.models.layers import GraphNetBlock

    f, b = 32, 4
    pos, ei = _toy_graph(nx=14, ny=10)
    n_real = len(pos)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, n_real, node_block=128)
    n = t.num_nodes

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    x = x.at[n_real:].set(0.0)
    e_orig = jax.random.normal(jax.random.fold_in(key, 1),
                               (senders.shape[0], b, f), jnp.float32) * 0.5

    block = GraphNetBlock(hidden_size=f, dtype=jnp.bfloat16)
    params = block.init(
        jax.random.fold_in(key, 2), x, e_orig,
        jnp.asarray(senders), jnp.asarray(receivers),
    )
    x_ref, e_ref = block.apply(
        params, x, e_orig, jnp.asarray(senders), jnp.asarray(receivers)
    )

    e_blocked = jnp.asarray(t.expand_edges(np.asarray(e_orig)))
    x_f, e_f = fused_gn_block(
        x, e_blocked,
        params["params"]["edge_block"], params["params"]["node_block"],
        t, interpret=True,
    )
    e_f_orig = t.reduce_edges(np.asarray(e_f, np.float32), senders.shape[0])

    np.testing.assert_allclose(np.asarray(x_f, np.float32)[:n_real],
                               np.asarray(x_ref, np.float32)[:n_real],
                               rtol=0.1, atol=0.1)
    np.testing.assert_allclose(e_f_orig,
                               np.asarray(e_ref, np.float32),
                               rtol=0.1, atol=0.1)
