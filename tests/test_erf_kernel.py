"""In-kernel erf: Mosaic-lowerable exact-GELU (regression).

Round 3 switched every gelu to the exact erf form for torch nn.GELU
parity — but Mosaic has no lowering for ``lax.erf``/``erfc``, so every
gelu-using fused kernel (transformer FFN, gelu EPD MLPs) failed to
compile on the real TPU ("Unimplemented primitive ... erf") while the
CPU interpret-mode tests kept passing. The kernels now use an in-kernel
fp32 polynomial (A&S 7.1.26, max abs err 1.5e-7).

Guards:
* polynomial accuracy vs lax.erf (forward AND the gelu derivative),
* the gelu helpers lower for the TPU platform inside a Pallas kernel
  (AOT via jax.export — no chip needed),
* the REAL fused gated-FFN (fwd + vjp) lowers for TPU.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jax_export
from jax.experimental import pallas as pl

from graph_physics_tpu.ops.fused_gnblock import _act, _act_grad, _erf


def test_erf_poly_accuracy():
    x = jnp.asarray(np.linspace(-6.0, 6.0, 20001), jnp.float32)
    got = _erf(x)
    want = jax.lax.erf(x)
    # 1.5e-7 theory bound + fp32 evaluation rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_gelu_helpers_accuracy():
    x = jnp.asarray(np.linspace(-8.0, 8.0, 4001), jnp.float32)
    got = _act("gelu")(x)
    want = jax.nn.gelu(x, approximate=False)
    # gelu error ≤ 0.5·|x|·erf_err
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    got_g = _act_grad("gelu", x)
    want_g = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               atol=1e-6)


def _lower_for_tpu(fn, *args):
    """AOT-lower for the TPU platform — runs the full Mosaic lowering
    (where unsupported primitives raise) without needing a chip."""
    jax_export.export(jax.jit(fn), platforms=("tpu",))(*args)


def test_gelu_kernel_lowers_for_tpu():
    def kernel(x_ref, o_ref, g_ref):
        x = x_ref[...]
        o_ref[...] = _act("gelu")(x)
        g_ref[...] = _act_grad("gelu", x)

    x = jnp.ones((8, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),) * 2,
    )
    _lower_for_tpu(fn, x)


def test_fused_gated_ffn_lowers_for_tpu():
    from graph_physics_tpu.models.layers import GatedMLPBlock
    from graph_physics_tpu.ops.fused_ffn import fused_gated_ffn

    n, b, h = 128, 4, 32
    x = jnp.zeros((n, b, h), jnp.float32)
    params = GatedMLPBlock(in_size=h, hidden_size=h, out_size=h).init(
        jax.random.PRNGKey(0), x[:, 0]
    )["params"]

    def step(x):
        def loss(x):
            return jnp.sum(fused_gated_ffn(x, params, activation="gelu"))

        return jax.grad(loss)(x)

    _lower_for_tpu(step, x)
