"""Trajectory-major packed batching: layout round-trip + numerical parity
with the stacked/vmapped path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.training import packed as pk
from tests.helpers import tiny_graph
from tests.test_train_step import make_setup


def stacked_batch(n=3):
    gs = [tiny_graph(frame=i) for i in range(n)]
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *gs)


def test_pack_roundtrip():
    b = stacked_batch(3)
    p = pk.pack(b)
    assert p.x.shape == (b.x.shape[1], 3, b.x.shape[2])
    assert p.node_type.ndim == 1
    s1 = pk.single_of(jax.tree.map(jnp.asarray, p), 1)
    np.testing.assert_allclose(np.asarray(s1.x), b.x[1], atol=0)
    np.testing.assert_array_equal(np.asarray(s1.senders), b.senders[0])


def test_pack_rejects_mixed_topology():
    b = stacked_batch(2)
    bad = b.replace(senders=np.stack([b.senders[0], b.senders[1][::-1].copy()]))
    with pytest.raises(ValueError, match="shared senders"):
        pk.pack(bad)


def test_packed_forward_matches_stacked():
    """Same params: packed EPD forward == per-sample vmapped forward."""
    sim, opt, _ = make_setup(noise_scale=0.0)
    b = stacked_batch(3)
    p = jax.tree.map(jnp.asarray, pk.pack(b))
    bj = jax.tree.map(jnp.asarray, b)

    params = sim.init_params(jax.random.PRNGKey(0), bj)
    state = sim.init_state()

    out_stacked = sim.forward(params, state, bj, is_training=False)
    out_packed = sim.forward(params, state, p, is_training=False)

    np.testing.assert_allclose(
        np.asarray(pk.unpack_nodes(out_packed.net_out)),
        np.asarray(out_stacked.net_out),
        atol=2e-4,
    )
    # normalizer statistics identical (same rows, different layout)
    np.testing.assert_allclose(
        float(out_packed.state.node_norm.acc_count),
        float(out_stacked.state.node_norm.acc_count),
    )


def test_packed_train_step_learns():
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    sim, opt, _ = make_setup(noise_scale=0.0)
    step_fn = make_train_step(
        sim, opt, LossType.L2LOSS, None, num_steps=200, donate=False
    )
    batch = jax.tree.map(jnp.asarray, pk.pack(stacked_batch(3)))
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    losses = []
    for i in range(40):
        state, m = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_packed_rope_epd_matches_stacked():
    """Relative-RoPE GraphNetBlocks also support the packed layout."""
    from graph_physics_tpu.models.processors import EncodeProcessDecode
    from graph_physics_tpu.models.simulator import Simulator

    model = EncodeProcessDecode(
        message_passing_num=2,
        node_input_size=11,
        edge_input_size=3,
        output_size=2,
        hidden_size=16,
        use_rope_embeddings=True,
        rope_pos_dimension=2,
    )
    sim = Simulator(11, 3, 2, 0, 2, 0, 2, 2, model)
    b = stacked_batch(3)
    p = jax.tree.map(jnp.asarray, pk.pack(b))
    bj = jax.tree.map(jnp.asarray, b)
    params = sim.init_params(jax.random.PRNGKey(0), bj)
    state = sim.init_state()
    out_stacked = sim.forward(params, state, bj, is_training=False)
    out_packed = sim.forward(params, state, p, is_training=False)
    np.testing.assert_allclose(
        np.asarray(pk.unpack_nodes(out_packed.net_out)),
        np.asarray(out_stacked.net_out),
        atol=2e-4,
    )


def test_attention_return_weights():
    from graph_physics_tpu.models import layers

    n, c = 8, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, c))
    s = jnp.array([(i + 1) % n for i in range(n)])
    r = jnp.arange(n)
    mod = layers.Attention(hidden_size=c, num_heads=4)
    params = mod.init(jax.random.PRNGKey(1), x, s, r)
    out, w = mod.apply(params, x, s, r, return_attention=True)
    assert out.shape == (n, c) and w.shape == (n, 4)
    # single incoming edge per node -> weight 1
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-5)
    out_d, w_d = mod.apply(params, x, return_attention=True)
    assert w_d.shape == (4, n, n)


def test_packed_transformer_matches_stacked():
    """Edge-attention (transformer) path also supports packed layout."""
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.models.simulator import Simulator

    model = EncodeTransformDecode(
        message_passing_num=2,
        node_input_size=11,
        output_size=2,
        hidden_size=16,
        num_heads=4,
    )
    sim = Simulator(11, 0, 2, 0, 2, 0, 2, 2, model)
    b = stacked_batch(3)
    p = jax.tree.map(jnp.asarray, pk.pack(b))
    bj = jax.tree.map(jnp.asarray, b)
    params = sim.init_params(jax.random.PRNGKey(0), bj)
    state = sim.init_state()
    out_stacked = sim.forward(params, state, bj, is_training=False)
    out_packed = sim.forward(params, state, p, is_training=False)
    np.testing.assert_allclose(
        np.asarray(pk.unpack_nodes(out_packed.net_out)),
        np.asarray(out_stacked.net_out),
        atol=2e-4,
    )


def test_packed_loader(tmp_path):
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.dataset.preprocessing import FrameConfig

    path, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=2, nx=7, ny=5, num_steps=6,
        meta_path=str(tmp_path / "m.json"),
    )
    ds = H5Dataset(path, meta, FrameConfig(targets=("velocity",)))
    loader = BatchLoader(ds, batch_size=3, packed=True, device_put=False, seed=0)
    batches = list(loader)
    assert len(batches) >= 2
    for b in batches:
        # packed layout: node axis first, shared [N] node_type
        assert b.node_type.ndim == 1
        assert b.x.shape[1] == 3


def test_packed_multiloss_matches_stacked():
    """MultiLoss (physics terms) under the packed fast path.

    Round-2 verdict repro: [N, B, F] packed graphs also have x.ndim == 3,
    so the stacked vmap-over-axis-0 path crashed on the unbatched topology
    leaves. The packed branch must vmap field leaves over axis 1 instead
    and match the stacked per-sample means (reference semantics:
    lightning_module.py:278-302 + utils/loss.py:429-482).
    """
    from graph_physics_tpu.training.loss import LossType, MultiLoss
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    sim, opt, _ = make_setup(noise_scale=0.0)
    loss_fn = MultiLoss(
        [
            LossType.L2LOSS,
            LossType.GRADIENTL2LOSS,
            LossType.DIVERGENCEL2LOSS,
            LossType.CONVECTIONL2LOSS,
        ],
        [1.0, 0.1, 0.05, 0.05],
    )
    step_fn = make_train_step(
        sim, opt, loss_fn, None, gradient_method="finite_diff",
        num_steps=10, donate=False,
    )
    b = stacked_batch(3)
    bj = jax.tree.map(jnp.asarray, b)
    p = jax.tree.map(jnp.asarray, pk.pack(b))
    state_s = init_train_state(sim, opt, jax.random.PRNGKey(0), bj)
    state_p = init_train_state(sim, opt, jax.random.PRNGKey(0), p)
    _, ms = step_fn(state_s, bj, jax.random.PRNGKey(1))
    _, mp_ = step_fn(state_p, p, jax.random.PRNGKey(1))
    assert np.isfinite(float(mp_["loss"]))
    np.testing.assert_allclose(
        float(mp_["loss"]), float(ms["loss"]), rtol=1e-5, atol=1e-6
    )
    for k in ms:
        if k.startswith("loss_term"):
            np.testing.assert_allclose(
                float(mp_[k]), float(ms[k]), rtol=1e-5, atol=1e-6, err_msg=k
            )


def test_packed_multiloss_wls_gradient():
    """least_squares (WLS) gradient method also works packed (faces shared)."""
    from graph_physics_tpu.training.loss import LossType, MultiLoss
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    sim, opt, _ = make_setup(noise_scale=0.0)
    loss_fn = MultiLoss(
        [LossType.L2LOSS, LossType.GRADIENTL2LOSS], [1.0, 0.1]
    )
    step_fn = make_train_step(
        sim, opt, loss_fn, None, gradient_method="least_squares",
        num_steps=10, donate=False,
    )
    b = stacked_batch(2)
    bj = jax.tree.map(jnp.asarray, b)
    p = jax.tree.map(jnp.asarray, pk.pack(b))
    state_s = init_train_state(sim, opt, jax.random.PRNGKey(0), bj)
    state_p = init_train_state(sim, opt, jax.random.PRNGKey(0), p)
    _, ms = step_fn(state_s, bj, jax.random.PRNGKey(1))
    _, mp_ = step_fn(state_p, p, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(mp_["loss"]), float(ms["loss"]), rtol=1e-5, atol=1e-6
    )


def test_broadcast_static_step_bit_identical(tmp_path):
    """pack_frames(broadcast_static=True) + the step's in-jit re-expand ==
    the host-repeated layout, bit-for-bit (metrics AND updated params) —
    the loader's committed default (trainer broadcast_static)."""
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.dataset.h5_dataset import H5Dataset
    from graph_physics_tpu.dataset.loader import BatchLoader
    from graph_physics_tpu.dataset.preprocessing import FrameConfig
    from graph_physics_tpu.training.step import init_train_state

    path, meta = synthetic.write_h5_dataset(
        str(tmp_path / "t.h5"), num_trajectories=1, nx=7, ny=5, num_steps=8,
        meta_path=str(tmp_path / "m.json"),
    )
    ds = H5Dataset(path, meta, FrameConfig(targets=("velocity",)))

    def first_batch(broadcast):
        loader = BatchLoader(
            ds, batch_size=4, packed=True, device_put=False, seed=0,
            shuffle=False, broadcast_static=broadcast,
        )
        return next(iter(loader))

    full = first_batch(False)
    compact = first_batch(True)
    # the shared static edge features actually rode the compact layout
    assert np.asarray(compact.edge_attr).shape[1] == 1
    assert np.asarray(full.edge_attr).shape[1] == 4
    # and the in-jit expansion reproduces the full layout exactly
    expanded = pk.expand_static_leaves(
        jax.tree.map(jnp.asarray, compact)
    )
    np.testing.assert_array_equal(
        np.asarray(expanded.edge_attr), np.asarray(full.edge_attr)
    )

    sim, opt, step_fn = make_setup(hidden=8, mp=1)
    rng = jax.random.PRNGKey(3)
    outs = []
    for b in (full, compact):
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), full)
        s, m = step_fn(state, b, rng)
        outs.append((s, m))
    (s1, m1), (s2, m2) = outs
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s1.params,
        s2.params,
    )
