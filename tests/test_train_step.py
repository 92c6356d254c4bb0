import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.processors import EncodeProcessDecode
from graph_physics_tpu.models.simulator import Simulator
from graph_physics_tpu.training import schedule
from graph_physics_tpu.training.loss import LossType, MultiLoss
from graph_physics_tpu.training.step import (
    NoiseConfig,
    init_train_state,
    make_train_step,
)
from tests.helpers import tiny_graph


def make_setup(hidden=16, mp=2, multi=False, noise_scale=0.02):
    model = EncodeProcessDecode(
        message_passing_num=mp,
        node_input_size=11,
        edge_input_size=3,
        output_size=2,
        hidden_size=hidden,
    )
    sim = Simulator(
        node_input_size=11,
        edge_input_size=3,
        output_size=2,
        feature_index_start=0,
        feature_index_end=2,
        output_index_start=0,
        output_index_end=2,
        node_type_index=2,
        model=model,
    )
    opt = schedule.make_optimizer(1e-3, warmup=10, num_steps=200)
    if multi:
        loss_fn = MultiLoss([LossType.L2LOSS, LossType.GRADIENTL2LOSS], [1.0, 0.1])
    else:
        loss_fn = LossType.L2LOSS
    noise = NoiseConfig(starts=(0,), ends=(2,), scales=(noise_scale,))
    step_fn = make_train_step(
        sim, opt, loss_fn, noise, gradient_method="finite_diff", num_steps=200,
        donate=False,
    )
    return sim, opt, step_fn


def batch_of(n=2, frame=0):
    gs = [tiny_graph(frame=frame + i) for i in range(n)]
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *gs)


def test_loss_decreases():
    # noise off: the synthetic Δ-targets are tiny, σ=0.02 would drown them
    sim, opt, step_fn = make_setup(noise_scale=0.0)
    batch = batch_of(2)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    rngs = jax.random.split(jax.random.PRNGKey(1), 60)
    losses = []
    for i in range(60):
        state, metrics = step_fn(state, batch, rngs[i])
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8
    assert int(state.step) == 60


def test_multiloss_runs():
    sim, opt, step_fn = make_setup(multi=True)
    batch = batch_of(2)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert "loss_term_0" in metrics and "loss_term_1" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_normalizer_accumulates_during_training():
    sim, opt, step_fn = make_setup()
    batch = batch_of(2)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    assert float(state.sim_state.output_norm.num_accumulations) == 1
    state, _ = step_fn(state, batch, jax.random.PRNGKey(2))
    assert float(state.sim_state.output_norm.num_accumulations) == 2


def test_noise_applied_to_normal_nodes_only():
    from graph_physics_tpu.core.nodetype import NodeType
    from graph_physics_tpu.training import noise as noise_lib
    from tests.helpers import tiny_graph

    g = jax.tree.map(jnp.asarray, tiny_graph())
    g2 = noise_lib.add_noise(g, jax.random.PRNGKey(0), [0], [2], [0.5])
    diff = np.abs(np.asarray(g2.x[:, :2] - g.x[:, :2])).sum(-1)
    nt = np.asarray(g.node_type)
    assert (diff[nt != NodeType.NORMAL] == 0).all()
    assert (diff[nt == NodeType.NORMAL] > 0).any()
    # other columns untouched
    np.testing.assert_array_equal(np.asarray(g2.x[:, 2:]), np.asarray(g.x[:, 2:]))


def test_multi_step_matches_sequential():
    """make_multi_step(K) == K sequential train steps (same rng split)."""
    import jax.numpy as jnp

    from graph_physics_tpu.training.step import make_multi_step

    sim, opt, step_fn = make_setup(noise_scale=0.0)
    batch = batch_of(2)
    s0 = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    multi = make_multi_step(step_fn, unroll=4)
    rng = jax.random.PRNGKey(5)
    s_multi, m = multi(jax.tree.map(jnp.array, s0), batch, rng)

    s_seq = jax.tree.map(jnp.array, s0)
    keys = jax.random.split(rng, 4)
    losses = []
    for i in range(4):
        s_seq, mi = step_fn(s_seq, batch, keys[i])
        losses.append(float(mi["loss"]))
    np.testing.assert_allclose(np.asarray(m["loss"]), losses, rtol=1e-4)
    assert int(s_multi.step) == int(s_seq.step) == 4
    for a, b in zip(jax.tree.leaves(s_multi.params), jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accumulation_equivalence():
    """MultiSteps(k=2) on two half-batches ~= one step on the full batch."""
    sim, _, _ = make_setup(noise_scale=0.0)
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import make_train_step

    full = batch_of(4)
    halves = [
        jax.tree.map(lambda a: a[:2], full),
        jax.tree.map(lambda a: a[2:], full),
    ]
    opt_full = schedule.make_optimizer(1e-2, warmup=1, num_steps=10)
    opt_acc = schedule.make_optimizer(1e-2, warmup=1, num_steps=10,
                                      accumulate_grad_batches=2)
    step_full = make_train_step(sim, opt_full, LossType.L2LOSS, donate=False)
    step_acc = make_train_step(sim, opt_acc, LossType.L2LOSS, donate=False)

    s1 = init_train_state(sim, opt_full, jax.random.PRNGKey(0), full)
    s2 = init_train_state(sim, opt_acc, jax.random.PRNGKey(0), halves[0])
    s2 = s2.replace(params=jax.tree.map(jnp.array, s1.params))
    p0 = jax.tree.map(jnp.array, s2.params)

    s1, _ = step_full(s1, full, jax.random.PRNGKey(1))
    # first micro-step: gradients buffered, params unchanged
    s2, _ = step_acc(s2, halves[0], jax.random.PRNGKey(1))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # second micro-step applies the averaged update
    s2, _ = step_acc(s2, halves[1], jax.random.PRNGKey(1))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(s2.params))
    )
    assert moved
    # and lands close to the full-batch update (normalizer statistics
    # evolving between micro-steps causes small inherent divergence)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


def test_cosine_warmup_schedule():
    sched = schedule.cosine_warmup_schedule(1.0, warmup=10, max_iters=100)
    lrs = [float(sched(s)) for s in range(100)]
    assert lrs[0] < lrs[9]  # warming up
    assert lrs[20] > lrs[80]  # decaying
    assert min(lrs) >= 0.001 - 1e-9  # floor
