"""Fused gated-FFN kernel (ops/fused_ffn) vs the XLA GatedMLPBlock."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_physics_tpu.models.layers import GatedMLPBlock
from graph_physics_tpu.ops.fused_ffn import fused_gated_ffn


def _setup(h=64, b=4, n=256, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (n, b, h), jnp.float32) * 0.5
    mod = GatedMLPBlock(in_size=h, hidden_size=h, out_size=h,
                        dtype=jnp.bfloat16)
    params = mod.init(jax.random.fold_in(key, 1),
                      jnp.zeros((1, h), jnp.bfloat16))["params"]
    return x.astype(jnp.bfloat16), mod, params


@pytest.mark.parametrize("h,b", [(64, 4), (32, 8), (128, 2)])
def test_fused_ffn_matches_xla(h, b):
    x, mod, params = _setup(h=h, b=b)
    ref = x + mod.apply({"params": params}, x)
    out = fused_gated_ffn(x, params, activation="gelu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_ffn_gradients_match():
    x, mod, params = _setup()
    cot = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def loss_ref(x, params):
        y = x + mod.apply({"params": params}, x)
        return jnp.sum(y.astype(jnp.float32) * cot)

    def loss_fused(x, params):
        y = fused_gated_ffn(x, params, activation="gelu", interpret=True)
        return jnp.sum(y.astype(jnp.float32) * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, params)

    for a, c, name in [(gr[0], gf[0], "dx")]:
        a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                   err_msg=name)
    for (ka, a), (kc, c) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gr[1]),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gf[1]),
               key=lambda t: str(t[0])),
    ):
        a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / scale, a / scale, atol=0.04,
                                   err_msg=str(ka))


def test_fused_ffn_silu():
    x, _, params = _setup(h=32, b=8)
    mod = GatedMLPBlock(in_size=32, hidden_size=32, out_size=32,
                        use_silu=True, dtype=jnp.bfloat16)
    ref = x + mod.apply({"params": params}, x)
    out = fused_gated_ffn(x, params, activation="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_ffn_with_pre_norm_matches_block_composition():
    """norm2 folded in: y = x + GatedMLPBlock(RMSNorm(x)) (TransformerBlock
    FFN half)."""
    from graph_physics_tpu.models.layers import RMSNorm

    h, b, n = 64, 4, 256
    x, mod, params = _setup(h=h, b=b, n=n)
    norm2 = RMSNorm(h, dtype=jnp.bfloat16)
    nparams = norm2.init(jax.random.PRNGKey(3), jnp.zeros((1, h)))["params"]
    scale = jax.random.normal(jax.random.PRNGKey(4), (h,)) * 0.2 + 1.0
    nparams = {"scale": scale}

    ref = x + mod.apply(
        {"params": params}, norm2.apply({"params": nparams}, x)
    )
    out = fused_gated_ffn(x, params, activation="gelu", interpret=True,
                          norm2_scale=jnp.asarray(scale))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_ffn_pre_norm_gradients():
    from graph_physics_tpu.models.layers import RMSNorm

    h, b, n = 32, 8, 128
    x, mod, params = _setup(h=h, b=b, n=n)
    norm2 = RMSNorm(h, dtype=jnp.bfloat16)
    scale = jnp.asarray(
        np.random.default_rng(5).normal(size=(h,)).astype(np.float32) * 0.2
        + 1.0
    )
    cot = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def loss_ref(x, params, scale):
        y = x + mod.apply(
            {"params": params}, norm2.apply({"params": {"scale": scale}}, x)
        )
        return jnp.sum(y.astype(jnp.float32) * cot)

    def loss_fused(x, params, scale):
        y = fused_gated_ffn(x, params, activation="gelu", interpret=True,
                            norm2_scale=scale)
        return jnp.sum(y.astype(jnp.float32) * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, params, scale)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, params, scale)
    for a, c, name in [(gr[0], gf[0], "dx"), (gr[2], gf[2], "dscale2")]:
        a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
        s = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(c / s, a / s, atol=0.04, err_msg=name)
