"""Fused in-kernel gumbel perturbation (ops/gumbel.py) guards.

``pltpu.prng_seed``/``prng_random_bits`` have no CPU/interpret lowering,
so the kernel itself cannot execute in this CPU suite. Guards here:

* AOT Mosaic lowering for the TPU platform (fwd AND the custom-vjp
  backward — the exact failure mode that silently broke the erf gelu
  kernels on hardware, tests/test_erf_kernel.py),
* the passthrough VJP contract against the XLA formulation,
* the wrapper's fallback selection (supported() is False off-TPU and for
  non-128-tiling [H, G] tails), so gumbel_softmax keeps the XLA draw in
  exactly those cases,
* the XLA path's distribution (the reference formula) — the kernel
  produces the same distribution from on-chip bits; its device
  statistics are asserted by scripts/bench_models.py's transolver run
  (BM_ASSERT floor) and were spot-checked on hardware round 5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jax_export

from graph_physics_tpu.models.transolver import gumbel_softmax
from graph_physics_tpu.ops import gumbel as gumbel_ops


def test_gumbel_kernel_lowers_for_tpu():
    """Full Mosaic lowering of fwd + vjp (no chip needed)."""
    x = jnp.zeros((512, 4, 32), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    def fwd(x):
        return gumbel_ops.gumbel_perturb(x, key).sum()

    jax_export.export(jax.jit(fwd), platforms=("tpu",))(x)
    jax_export.export(jax.jit(jax.grad(fwd)), platforms=("tpu",))(x)


def test_vjp_is_passthrough():
    """The noise is additive: d(out)/d(logits) == identity. Compare the
    custom-vjp pullback against the XLA formulation's (whose noise is
    also additive), traced without running the kernel."""
    x = jnp.ones((256, 4, 32), jnp.bfloat16)
    key = jax.random.PRNGKey(1)

    def fused(x):
        return (gumbel_ops.gumbel_perturb(x, key) * 2.0).sum()

    # grad of sum(2*(x+g)) wrt x is exactly 2 everywhere, regardless of
    # g: the backward must be a pure passthrough — exactly ONE
    # pallas_call in the grad jaxpr (the forward), none in the pullback
    jaxpr = jax.make_jaxpr(jax.grad(fused))(x)
    assert str(jaxpr).count("pallas_call") == 1, (
        "backward must not re-enter the kernel (passthrough vjp)"
    )


def test_supported_gates():
    # off-TPU this suite runs on CPU: kernel must be gated off
    assert jax.default_backend() != "tpu"
    assert not gumbel_ops.supported((100, 4, 32))

    # gumbel_softmax then keeps the exact XLA draw — reference formula
    key = jax.random.PRNGKey(2)
    logits = jnp.zeros((4000, 4, 32), jnp.float32)
    tau = jnp.ones((4000, 4, 1), jnp.float32)
    w = gumbel_softmax(logits, tau, key, fused=True)  # falls back
    w_ref = gumbel_softmax(logits, tau, key, fused=False)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w_ref))


def test_xla_draw_distribution():
    """The XLA fallback (and the kernel, by construction from U[0,1))
    follows Gumbel(0,1): mean γ≈0.5772, std π/√6≈1.2825."""
    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (200_000,), jnp.float32)
    g = -jnp.log(-jnp.log(u + 1e-8) + 1e-8)
    g = np.asarray(g)
    assert abs(g.mean() - 0.5772) < 0.02
    assert abs(g.std() - 1.2825) < 0.02


def test_seed_array_shape():
    """One (seed0, seed1) pair per ROWS block — stream independence
    across grid blocks comes from the seed ARRAY (vmap-safe), not
    program_id mixing."""
    n = gumbel_ops.ROWS * 3 + 7
    nb = -(-n // gumbel_ops.ROWS)
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(0), (nb, 2), jnp.uint32),
        jnp.int32,
    )
    assert seeds.shape == (nb, 2)
    # distinct per block
    assert len({tuple(r) for r in np.asarray(seeds).tolist()}) == nb
