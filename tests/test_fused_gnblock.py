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
    sidx_flat = t.sidx.reshape(-1)
    rank = np.minimum(sidx_flat // t.window_unit, t.window_blocks - 1)
    glob_s = t.win_start[gids, rank] * t.window_unit + sidx_flat % t.window_unit
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


@pytest.mark.parametrize("activation", ["relu", "silu", "gelu"])
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


def test_fused_block_folded_encoder_matches():
    """edge_encoder_params folds the encoder MLP into the kernel: fwd and
    grads match (XLA bf16 MLP encode -> fused block)."""
    from graph_physics_tpu.models.layers import MLP

    f, b = 32, 4
    pos, ei = _toy_graph(nx=12, ny=8)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, len(pos), node_block=128)
    n = t.num_nodes
    fe = 3

    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_raw = jnp.asarray(
        t.expand_edges(
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, 1), (senders.shape[0], b, fe)
                )
            )
        )
    )

    enc = MLP(hidden_size=f, out_size=f, dtype=jnp.bfloat16)
    enc_params = enc.init(jax.random.fold_in(key, 2), jnp.zeros((1, fe)))["params"]
    ep = _params(jax.random.fold_in(key, 3), f, 3)
    np_ = _params(jax.random.fold_in(key, 4), f, 2)

    cot_x = jax.random.normal(jax.random.fold_in(key, 5), (n, b, f))
    cot_e = jax.random.normal(jax.random.fold_in(key, 6), (e_raw.shape[0], b, f))

    def enc_ref(p, h):
        # dtype-faithful mirror of the kernel's encoder flow (bf16
        # activations, fp32 dot accumulation / RMS statistics) — a flax
        # MLP differs by 1-ulp rounding, which relu gates then amplify
        import math as _m

        def dense(z, kern):
            return jax.lax.dot_general(
                z.astype(jnp.bfloat16), kern.astype(jnp.bfloat16),
                dimension_numbers=(((z.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        n_dense = len([k for k in p if k.startswith("Dense_")])
        h = dense(h, p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"].astype(jnp.bfloat16)
        for i in range(1, n_dense):
            h = dense(jax.nn.relu(h), p[f"Dense_{i}"]["kernel"])
            h = h + p[f"Dense_{i}"]["bias"].astype(jnp.bfloat16)
        sq = h * h
        gs = jnp.sum(sq.astype(jnp.float32), -1, keepdims=True)
        rms = jnp.sqrt(gs + 1e-24) / _m.sqrt(f)
        inv = 1.0 / (rms + 1e-8)
        return h * inv.astype(jnp.bfloat16) * p["RMSNorm_0"]["scale"].astype(jnp.bfloat16)

    def loss_ref(x, e_raw, enc_params, ep, np_):
        e_enc = enc_ref(enc_params, e_raw.astype(jnp.bfloat16))
        xo, eo = fused_gn_block(x, e_enc, ep, np_, t, interpret=True)
        return jnp.sum(xo.astype(jnp.float32) * cot_x) + jnp.sum(
            eo.astype(jnp.float32) * cot_e)

    def loss_folded(x, e_raw, enc_params, ep, np_):
        xo, eo = fused_gn_block(
            x, e_raw, ep, np_, t, interpret=True,
            edge_encoder_params=enc_params)
        return jnp.sum(xo.astype(jnp.float32) * cot_x) + jnp.sum(
            eo.astype(jnp.float32) * cot_e)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 2, 3, 4))(
        x, e_raw, enc_params, ep, np_)
    v_fld, g_fld = jax.value_and_grad(loss_folded, argnums=(0, 2, 3, 4))(
        x, e_raw, enc_params, ep, np_)

    np.testing.assert_allclose(float(v_fld), float(v_ref), rtol=0.02)
    for tr, tf, name in zip(g_ref, g_fld, ["dx", "enc_w", "edge_w", "node_w"]):
        for a, c in zip(jax.tree.leaves(tr), jax.tree.leaves(tf)):
            a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
            scale = max(np.abs(a).max(), 1e-3)
            np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                       err_msg=name)


def test_fused_block_last_block_matches():
    """last_block skips the dead edge-output traffic; x output and grads
    through x match the full block exactly when eout is unused."""
    f, b = 32, 4
    pos, ei = _toy_graph(nx=12, ny=8)
    senders, receivers = ei
    t = tiling_lib.build_edge_tiling(senders, receivers, len(pos), node_block=128)
    n = t.num_nodes

    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (n, b, f), jnp.float32) * 0.5
    e_blocked = jnp.asarray(
        t.expand_edges(
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, 1), (senders.shape[0], b, f)
                )
            )
        )
    )
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)
    cot_x = jax.random.normal(jax.random.fold_in(key, 4), (n, b, f))

    def loss(last, x, e, ep, np_):
        xo, eo = fused_gn_block(x, e, ep, np_, t, interpret=True,
                                last_block=last)
        return jnp.sum(xo.astype(jnp.float32) * cot_x)

    v0, g0 = jax.value_and_grad(loss, argnums=(1, 2, 3, 4))(False, x, e_blocked, ep, np_)
    v1, g1 = jax.value_and_grad(loss, argnums=(1, 2, 3, 4))(True, x, e_blocked, ep, np_)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for tr, tf in zip(g0, g1):
        for a, c in zip(jax.tree.leaves(tr), jax.tree.leaves(tf)):
            np.testing.assert_allclose(
                np.asarray(c, np.float32), np.asarray(a, np.float32),
                rtol=1e-3, atol=1e-5)


def test_epd_fused_folded_matches_xla():
    """Full EncodeProcessDecode with tiling (folded encoder + last-block
    elision) vs the plain XLA path, same params, packed batch."""
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.ops.tiling import apply_to_graph
    from tests.helpers import tiny_graph

    f, b = 32, 4
    g = tiny_graph(nx=14, ny=10)
    t = tiling_lib.build_edge_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), g.x.shape[0],
        edge_mask=np.asarray(g.edge_mask), node_block=128)
    gt = apply_to_graph(g, t)

    key = jax.random.PRNGKey(5)
    def packed(graph):
        e = graph.senders.shape[0]
        n = graph.x.shape[0]
        x = jax.random.normal(key, (n, b, 4), jnp.float32) * 0.5
        ea = jax.random.normal(jax.random.fold_in(key, 1), (e, b, 3)) * 0.5
        return graph.replace(x=jnp.asarray(x), edge_attr=jnp.asarray(ea))

    # shared per-edge features: build on the original graph, expand into
    # the blocked layout so both paths see identical inputs
    gp = packed(jax.tree.map(jnp.asarray, g))
    ea_blocked = jnp.asarray(t.expand_edges(np.asarray(gp.edge_attr)))
    n_pad = t.num_nodes
    x_pad = jnp.zeros((n_pad, b, 4)).at[: gp.x.shape[0]].set(gp.x)
    gt = jax.tree.map(jnp.asarray, gt)
    gt = gt.replace(x=x_pad, edge_attr=ea_blocked)

    kwargs = dict(
        message_passing_num=3, node_input_size=4, edge_input_size=3,
        output_size=2, hidden_size=f, dtype=jnp.bfloat16,
    )
    m_xla = EncodeProcessDecode(**kwargs)
    m_fused = EncodeProcessDecode(edge_tiling=t, **kwargs)
    params = m_xla.init(jax.random.fold_in(key, 2), gp)
    # identical param trees: the fused model reuses them directly
    out_xla = m_xla.apply(params, gp)
    out_fused = m_fused.apply(params, gt)

    n_real = int(g.n_node)
    a = np.asarray(out_xla, np.float32)[:n_real]
    c = np.asarray(out_fused, np.float32)[:n_real]
    np.testing.assert_allclose(c, a, rtol=0.15, atol=0.15)
    # and gradients flow through the folded path to every param incl. the
    # folded encoder's
    def loss(p):
        return jnp.sum(m_fused.apply(p, gt).astype(jnp.float32)[:n_real] ** 2)

    grads = jax.grad(loss)(params)
    enc_g = grads["params"]["edges_encoder"]
    assert max(
        float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(enc_g)
    ) > 0


def test_trainer_fused_path(tmp_path):
    """Trainer(fused=True): per-trajectory tilings built in the loader,
    per-topology step clones sharing one param state; loss matches the
    unfused Trainer to bf16 tolerance, and the tilings were actually built."""
    import json

    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

    h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=2, nx=8, ny=6, num_steps=6,
        meta_path=str(tmp_path / "meta.json"),
    )
    fc = FrameConfig(targets=("velocity",))

    def make_trainer(fused):
        model = EncodeProcessDecode(
            message_passing_num=2, node_input_size=11, edge_input_size=3,
            output_size=2, hidden_size=32, dtype=jnp.bfloat16,
        )
        sim = Simulator(
            node_input_size=11, edge_input_size=3, output_size=2,
            feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
            model=model,
        )
        cfg = TrainerConfig(
            epochs=1, batch_size=4, warmup=2, packed=True, fused=fused,
            out_dir=str(tmp_path / ("rf" if fused else "rx")), run_name="r",
        )
        return Trainer(
            sim, H5Dataset(h5, meta, fc), None, LossType.L2LOSS, cfg,
        )

    t_f = make_trainer(True)
    t_f.fit()
    # both trajectories got a tiling (different topologies, both tileable)
    assert len(t_f._fused_mgr._tilings) == 2
    assert all(e[0] is not None for e in t_f._fused_mgr._tilings.values())
    assert len(t_f._fused_mgr._steps) == 2

    t_x = make_trainer(False)
    t_x.fit()

    mf = [json.loads(l) for l in open(tmp_path / "rf" / "r" / "r.metrics.jsonl")]
    mx = [json.loads(l) for l in open(tmp_path / "rx" / "r" / "r.metrics.jsonl")]
    lf = [m["train_loss_epoch"] for m in mf if "train_loss_epoch" in m][-1]
    lx = [m["train_loss_epoch"] for m in mx if "train_loss_epoch" in m][-1]
    assert abs(lf - lx) / max(abs(lx), 1e-6) < 0.05, (lf, lx)


def test_trainer_fused_multi_step_dispatch(tmp_path):
    """fused + steps_per_dispatch>1: batches group per topology (flush on
    trajectory change), each topology gets its own multi-step, loss sane."""
    import json

    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.trainer import Trainer, TrainerConfig

    h5, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=2, nx=8, ny=6, num_steps=9,
        meta_path=str(tmp_path / "meta.json"),
    )
    fc = FrameConfig(targets=("velocity",))
    model = EncodeProcessDecode(
        message_passing_num=1, node_input_size=11, edge_input_size=3,
        output_size=2, hidden_size=32, dtype=jnp.bfloat16,
    )
    sim = Simulator(
        node_input_size=11, edge_input_size=3, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=model,
    )
    cfg = TrainerConfig(
        epochs=1, batch_size=4, warmup=2, packed=True, fused=True,
        steps_per_dispatch=2,
        out_dir=str(tmp_path / "runs"), run_name="r",
    )
    tr = Trainer(sim, H5Dataset(h5, meta, fc), None, LossType.L2LOSS, cfg)
    tr.fit()
    assert len(tr._fused_mgr._tilings) == 2
    assert len(tr._fused_multi) >= 1  # per-topology multi-steps built
    mf = [json.loads(l) for l in open(tmp_path / "runs" / "r" / "r.metrics.jsonl")]
    loss = [m["train_loss_epoch"] for m in mf if "train_loss_epoch" in m][-1]
    assert np.isfinite(loss) and loss > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_blocked_semantics_on_random_sparse_graphs(seed):
    """Property test for the arbitrary-unit window tiling: random sparse
    graphs (empty groups, isolated nodes, non-mesh degree distributions)
    after an RCM reorder — blocked_reference must equal plain
    gather/segment-sum message passing on the same edges."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(150, 400))
    e = int(rng.integers(n, 4 * n))
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    # make it somewhat local so RCM can tile it, but keep a few long edges
    r = np.where(rng.random(e) < 0.9, np.clip(s + rng.integers(-9, 10, e), 0, n - 1), r)
    perm = tiling_lib.rcm_order(s, r, n)
    inv = np.argsort(perm)
    s2, r2 = inv[s], inv[r]
    order = np.argsort(r2, kind="stable")
    s2, r2 = s2[order], r2[order]
    t = tiling_lib.build_edge_tiling(s2, r2, n)
    if t is None:
        pytest.skip("random graph untileable even after RCM")

    f, b = 32, 2
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (t.num_nodes, b, f), jnp.float32) * 0.5
    evals = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (e, b, f))
    ) * 0.5
    evals = evals[order]  # tiling.perm indexes the receiver-sorted list
    e_blocked = jnp.asarray(t.expand_edges(evals))
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)
    xo, eo = blocked_reference(x, e_blocked, ep, np_, t)

    # plain XLA reference on the raw edge list
    ee = jnp.asarray(evals)

    import math as m

    def mlp(parts, params):
        h = jnp.concatenate(parts, axis=-1)
        n_dense = len([k for k in params if k.startswith("Dense_")])
        for i in range(n_dense):
            h = h @ params[f"Dense_{i}"]["kernel"] + params[f"Dense_{i}"]["bias"]
            if i < n_dense - 1:
                h = jax.nn.relu(h)
        sc = params["RMSNorm_0"]["scale"]
        gs = jnp.sum(h * h, -1, keepdims=True)
        rr = jnp.sqrt(gs + 1e-24) / m.sqrt(f)
        return h / (rr + 1e-8) * sc

    sj, rj = jnp.asarray(s2), jnp.asarray(r2)
    eh = mlp([ee, x[rj], x[sj]], ep)
    agg = jax.ops.segment_sum(eh, rj, num_segments=t.num_nodes)
    ref_x = x + mlp([x, agg], np_)
    np.testing.assert_allclose(
        np.asarray(xo)[:n], np.asarray(ref_x)[:n], rtol=3e-4, atol=3e-4
    )
    # edge outputs round-trip through the blocked layout
    ref_e = ee + eh
    back = t.reduce_edges(np.asarray(eo), e)
    np.testing.assert_allclose(back, np.asarray(ref_e), rtol=3e-4, atol=3e-4)


def test_fused_kernel_on_wide_window_tiling():
    """The PALLAS kernel (interpret mode) on a tiling whose sender units
    are scattered (wb well above the banded case) — exercises the
    arbitrary-unit window reads and the adaptive lane caps end to end."""
    rng = np.random.default_rng(3)
    n = 512
    e = 2200
    s = rng.integers(0, n, size=e)
    # receivers local-ish, senders include far jumps -> many units/group
    r = np.clip(s + rng.integers(-20, 21, e), 0, n - 1)
    jump = rng.random(e) < 0.25
    s = np.where(jump, rng.integers(0, n, size=e), s)
    order = np.argsort(r, kind="stable")
    s, r = s[order], r[order]
    t = tiling_lib.build_edge_tiling(s, r, n)
    assert t is not None
    assert t.window_blocks >= 6, t.window_blocks  # genuinely wide

    f, b = 32, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t.num_nodes, b, f), jnp.float32) * 0.5
    evals = np.asarray(
        jax.random.normal(jax.random.fold_in(key, 1), (e, b, f))) * 0.5
    e_blocked = jnp.asarray(t.expand_edges(evals))
    ep = _params(jax.random.fold_in(key, 2), f, 3)
    np_ = _params(jax.random.fold_in(key, 3), f, 2)

    xf, ef = fused_gn_block(x, e_blocked, ep, np_, t, interpret=True)
    xr, er = blocked_reference(x, e_blocked, ep, np_, t,
                               compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(xf, np.float32),
                               np.asarray(xr, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(ef, np.float32),
                               np.asarray(er, np.float32),
                               rtol=0.05, atol=0.05)
