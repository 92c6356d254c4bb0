import jax.numpy as jnp
import numpy as np

from graph_physics_tpu.models.normalizer import (
    normalize,
    normalizer_init,
    normalizer_inverse,
)


def test_accumulates_and_normalizes():
    state = normalizer_init(2)
    data = jnp.array([[1.0, 10.0], [3.0, 30.0]])
    out, state = normalize(state, data, accumulate=True)
    # mean [2,20], std [1,10]
    np.testing.assert_allclose(np.asarray(out), [[-1, -1], [1, 1]], atol=1e-5)
    assert float(state.acc_count) == 2
    assert float(state.num_accumulations) == 1


def test_inverse_roundtrip():
    state = normalizer_init(3)
    data = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [-1.0, 0.0, 2.0]])
    _, state = normalize(state, data, accumulate=True)
    out, _ = normalize(state, data, accumulate=False)
    back = normalizer_inverse(state, out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(data), atol=1e-5)


def test_mask_excludes_padding():
    state = normalizer_init(1)
    data = jnp.array([[1.0], [3.0], [1000.0]])
    mask = jnp.array([True, True, False])
    _, state = normalize(state, data, mask=mask, accumulate=True)
    np.testing.assert_allclose(float(state.acc_sum[0]), 4.0)
    np.testing.assert_allclose(float(state.acc_count), 2.0)


def test_max_accumulations_gate():
    state = normalizer_init(1, max_accumulations=2)
    data = jnp.ones((4, 1))
    for _ in range(5):
        _, state = normalize(state, data, accumulate=True)
    assert float(state.num_accumulations) == 2
    assert float(state.acc_count) == 8


def test_no_accumulate_keeps_state():
    state = normalizer_init(1)
    data = jnp.ones((4, 1))
    _, state2 = normalize(state, data, accumulate=False)
    assert float(state2.acc_count) == 0


def test_batched_leading_dims():
    state = normalizer_init(2)
    data = jnp.ones((3, 4, 2))
    _, state = normalize(state, data, accumulate=True)
    assert float(state.acc_count) == 12
