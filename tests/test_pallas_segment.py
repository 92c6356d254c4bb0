"""Pallas sorted-segment-sum kernel, run in interpreter mode on CPU
(the real-TPU validation happens in bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graph_physics_tpu.ops.pallas_segment as ps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _case(n, e, h, seed=0):
    rng = np.random.default_rng(seed)
    recv = np.sort(rng.integers(0, n, e)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    return vals, jnp.asarray(recv)


def test_matches_xla_segment_sum():
    n, e, h = 512, 3072, 8
    vals, recv = _case(n, e, h)
    out = ps.sorted_segment_sum(vals, recv, n)
    ref = jax.ops.segment_sum(vals, recv, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_empty_and_full_segments():
    n, e, h = 512, 2048, 4
    rng = np.random.default_rng(1)
    # concentrate edges on few nodes -> many empty segments
    recv = np.sort(rng.integers(100, 110, e)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(e, h)).astype(np.float32))
    out = ps.sorted_segment_sum(vals, jnp.asarray(recv), n)
    ref = jax.ops.segment_sum(vals, jnp.asarray(recv), num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_gradient_is_gather():
    n, e, h = 512, 1024, 4
    vals, recv = _case(n, e, h, seed=2)

    def f(v):
        return jnp.sum(ps.sorted_segment_sum(v, recv, n) ** 2)

    def f_ref(v):
        return jnp.sum(jax.ops.segment_sum(v, recv, num_segments=n) ** 2)

    g = jax.grad(f)(vals)
    g_ref = jax.grad(f_ref)(vals)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3)


def test_small_graph_fallback():
    # e < CE falls back to XLA path (no pallas invocation needed)
    n, e, h = 32, 64, 4
    vals, recv = _case(n, e, h, seed=3)
    out = ps.sorted_segment_sum(vals, recv, n)
    ref = jax.ops.segment_sum(vals, recv, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
