import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.spatial_mtp import (
    SpatialMTPConfig,
    StarEncoder,
    build_star_tables,
    spatial_mtp_loss,
)
from tests.helpers import tiny_graph


def test_build_star_tables():
    # path graph 0-1-2 both directions
    senders = jnp.array([0, 1, 1, 2, 0, 0])
    receivers = jnp.array([1, 0, 2, 1, 0, 0])
    mask = jnp.array([True, True, True, True, False, False])
    centers = jnp.array([1, 2, 0])
    cvalid = jnp.array([True, True, True])
    nbrs, valid = build_star_tables(senders, receivers, mask, 3, centers, cvalid, k=4)
    # node 1 has neighbors {0, 2}
    got1 = set(np.asarray(nbrs[0])[np.asarray(valid[0])].tolist())
    assert got1 == {0, 2}
    got2 = set(np.asarray(nbrs[1])[np.asarray(valid[1])].tolist())
    assert got2 == {1}
    got0 = set(np.asarray(nbrs[2])[np.asarray(valid[2])].tolist())
    assert got0 == {1}  # masked self-edges excluded


def test_star_tables_invalid_center():
    senders = jnp.array([0, 1])
    receivers = jnp.array([1, 0])
    mask = jnp.array([True, True])
    nbrs, valid = build_star_tables(
        senders, receivers, mask, 2, jnp.array([0]), jnp.array([False]), k=2
    )
    assert not np.asarray(valid).any()


def test_encoder_pad_invariance():
    enc = StarEncoder(d_model=8, num_heads=2, num_layers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    pad = jnp.zeros((3, 5), bool).at[:, 3:].set(True)
    params = enc.init(jax.random.PRNGKey(1), x, pad)
    out = enc.apply(params, x, pad)
    x2 = x.at[:, 3:].set(99.0)
    out2 = enc.apply(params, x2, pad)
    np.testing.assert_allclose(
        np.asarray(out[:, :3]), np.asarray(out2[:, :3]), atol=1e-5
    )


def test_spatial_mtp_loss_runs():
    g = jax.tree.map(jnp.asarray, tiny_graph())
    n = g.x.shape[0]
    d = 16
    cfg = SpatialMTPConfig(d_model=d, centers_per_step=8, max_neighbors=6)
    enc = StarEncoder(d_model=d, num_heads=4, num_layers=1)
    h = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    he = jax.random.normal(jax.random.PRNGKey(1), (n, d))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (n, 2))
    params = enc.init(jax.random.PRNGKey(3), jnp.zeros((2, 7, d)), jnp.zeros((2, 7), bool))
    head = lambda z: z[..., :2]
    aux, stats = spatial_mtp_loss(params, enc, cfg, g, h, he, tgt, head, jax.random.PRNGKey(4))
    assert np.isfinite(float(aux))
    assert float(stats["sp_mtp/pairs"]) > 0


def test_spatial_mtp_packed():
    """Packed [N,B,d] inputs: shared topology, per-sample stars."""
    g = jax.tree.map(jnp.asarray, tiny_graph())
    n, b, d = g.x.shape[0], 3, 16
    cfg = SpatialMTPConfig(d_model=d, centers_per_step=8, max_neighbors=6)
    enc = StarEncoder(d_model=d, num_heads=4, num_layers=1)
    h = jax.random.normal(jax.random.PRNGKey(0), (n, b, d))
    he = jax.random.normal(jax.random.PRNGKey(1), (n, b, d))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (n, b, 2))
    params = enc.init(
        jax.random.PRNGKey(3), jnp.zeros((2, 7, d)), jnp.zeros((2, 7), bool)
    )
    head = lambda z: z[..., :2]
    aux, stats = spatial_mtp_loss(
        params, enc, cfg, g, h, he, tgt, head, jax.random.PRNGKey(4)
    )
    assert np.isfinite(float(aux))
    assert float(stats["sp_mtp/pairs"]) > 0


def test_train_step_with_mtp_packed():
    """Full packed train step with the MTP aux loss."""
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack
    from graph_physics_tpu.training.step import init_train_state, make_train_step

    param = {
        "model": {
            "type": "epd", "message_passing_num": 1, "hidden_size": 16,
            "node_input_size": 2, "output_size": 2, "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0, "feature_index_end": 2,
            "output_index_start": 0, "output_index_end": 2, "node_type_index": 2,
        },
        "training": {
            "use_spatial_mtp": True, "spatial_mtp_centers_per_step": 8,
            "spatial_mtp_max_neighbors": 6,
        },
    }
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    mtp = config_lib.get_mtp_setup(param)
    opt = schedule.make_optimizer(1e-3, 5, 100)
    step_fn = make_train_step(sim, opt, LossType.L2LOSS, mtp=mtp, donate=False)
    gs = [tiny_graph(frame=i) for i in range(2)]
    import numpy as _np

    batch = pack(jax.tree.map(lambda *xs: _np.stack(xs), *gs))
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch, mtp=mtp)
    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["sp_mtp/pairs"]) > 0


def test_train_step_with_mtp():
    """Full integration: EPD + spatial MTP aux loss in the jitted step."""
    from graph_physics_tpu.training import config as config_lib
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import (
        init_train_state,
        make_train_step,
        model_params,
    )

    param = {
        "model": {
            "type": "epd", "message_passing_num": 2, "hidden_size": 16,
            "node_input_size": 2, "output_size": 2, "edge_input_size": 3,
        },
        "index": {
            "feature_index_start": 0, "feature_index_end": 2,
            "output_index_start": 0, "output_index_end": 2, "node_type_index": 2,
        },
        "training": {
            "use_spatial_mtp": True, "spatial_mtp_alpha": 0.2,
            "spatial_mtp_centers_per_step": 16, "spatial_mtp_max_neighbors": 6,
        },
    }
    model = config_lib.get_model(param)
    sim = config_lib.get_simulator(param, model)
    mtp = config_lib.get_mtp_setup(param)
    opt = schedule.make_optimizer(1e-3, 5, 100)
    step_fn = make_train_step(sim, opt, LossType.L2LOSS, mtp=mtp, donate=False)

    gs = [tiny_graph(frame=i) for i in range(2)]
    batch = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *gs)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch, mtp=mtp)
    assert set(state.params.keys()) == {"model", "mtp"}

    s1, m1 = step_fn(state, batch, jax.random.PRNGKey(1))
    assert "sp_mtp/aux_loss" in m1
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["sp_mtp/pairs"]) > 0
    # mtp encoder params actually receive gradients (change after a step)
    before = jax.tree.leaves(state.params["mtp"])[0]
    after = jax.tree.leaves(s1.params["mtp"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # rollout path uses unwrapped model params
    assert "params" in model_params(s1.params)


def test_star_tables_uniform_sampling():
    """degree > K: kept neighbors are a uniform random subset WITHOUT
    replacement (reference randperm(c)[:k], spatial_mtp_1hop.py:131-139)."""
    # star: node 0 has 6 neighbors 1..6
    senders = jnp.array([0] * 6 + [1, 2, 3, 4, 5, 6])
    receivers = jnp.array([1, 2, 3, 4, 5, 6] + [0] * 6)
    mask = jnp.ones(12, bool)
    centers = jnp.array([0])
    cvalid = jnp.array([True])
    k = 3

    freq = np.zeros(7)
    n_draws = 400
    for i in range(n_draws):
        nbrs, valid = build_star_tables(
            senders, receivers, mask, 7, centers, cvalid, k=k,
            rng=jax.random.PRNGKey(i),
        )
        sel = np.asarray(nbrs[0])[np.asarray(valid[0])]
        assert len(sel) == k and len(set(sel.tolist())) == k  # no replacement
        assert set(sel.tolist()) <= {1, 2, 3, 4, 5, 6}
        freq[sel] += 1
    # each neighbor kept with p=k/6=0.5; 400 draws -> ~200 each (±4 sigma)
    p = freq[1:] / n_draws
    assert (np.abs(p - 0.5) < 0.1).all(), p


def test_star_tables_sampling_keeps_all_when_under_cap():
    """degree <= K: sampling keeps every neighbor (just reordered)."""
    senders = jnp.array([0, 0, 1, 2])
    receivers = jnp.array([1, 2, 0, 0])
    mask = jnp.ones(4, bool)
    nbrs, valid = build_star_tables(
        senders, receivers, mask, 3, jnp.array([0]), jnp.array([True]), k=4,
        rng=jax.random.PRNGKey(0),
    )
    got = set(np.asarray(nbrs[0])[np.asarray(valid[0])].tolist())
    assert got == {1, 2}


def test_star_tables_sampling_k_exceeds_edge_count():
    """k larger than the padded edge array must not crash the sampling
    path (regression: top_k(k) with k > len(scores))."""
    senders = jnp.array([0, 0, 1, 2])
    receivers = jnp.array([1, 2, 0, 0])
    mask = jnp.ones(4, bool)
    nbrs, valid = build_star_tables(
        senders, receivers, mask, 3, jnp.array([0]), jnp.array([True]), k=6,
        rng=jax.random.PRNGKey(0),
    )
    assert nbrs.shape == (1, 6)
    got = set(np.asarray(nbrs[0])[np.asarray(valid[0])].tolist())
    assert got == {1, 2}
