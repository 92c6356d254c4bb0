"""Time the fused GraphNetBlock kernel on the real TPU vs the XLA block."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def scan_time(make_body, init, k1=4, k2=20, label="", reps=4):
    def run(k):
        @jax.jit
        def f(c):
            c, _ = jax.lax.scan(lambda c, _: (make_body(c), None), c, None, length=k)
            return jax.tree.reduce(
                lambda a, b: a + b,
                jax.tree.map(lambda l: l.astype(jnp.float32).ravel()[0], c),
            )

        out = float(f(init))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = float(f(init))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(k1), run(k2)
    per = (t2 - t1) / (k2 - k1)
    print(f"{label:58s} {per*1e3:9.3f} ms/iter")
    return per


def main():
    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.ops.fused_gnblock import fused_gn_block
    def _params(key, f, n_in_parts, n_layers=4):
        import numpy as _np
        ks = jax.random.split(key, 2 * n_layers + 1)
        pd = {}
        fan_in = n_in_parts * f
        for i in range(n_layers):
            pd[f"Dense_{i}"] = {
                "kernel": jax.random.normal(ks[2 * i], (fan_in, f), jnp.float32)
                * (1.0 / _np.sqrt(fan_in)),
                "bias": jax.random.normal(ks[2 * i + 1], (f,)) * 0.1,
            }
            fan_in = f
        pd["RMSNorm_0"] = {"scale": 1.0 + 0.1 * jax.random.normal(ks[-1], (f,))}
        return pd

    B, F = 128, 32
    sim, opt, _u, g = _cylinder_setup(nx=48, ny=40, hidden=F, mp_steps=5, batch=B, packed=True)
    senders = np.asarray(g.senders)
    receivers = np.asarray(g.receivers)
    emask = np.asarray(g.edge_mask)
    n_real = g.x.shape[0]
    t = tiling_lib.build_edge_tiling(senders, receivers, n_real,
                                     edge_mask=emask, node_block=128)
    assert t is not None, "tiling failed"
    print(f"N={t.num_nodes} groups={t.num_groups} emax={t.edges_per_block} "
          f"wb={t.window_blocks} E_blocked={t.num_groups*t.edges_per_block} "
          f"(orig E={senders.shape[0]})")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t.num_nodes, B, F), jnp.bfloat16)
    e = jax.random.normal(key, (t.num_groups * t.edges_per_block, B, F), jnp.bfloat16)
    ep = _params(jax.random.fold_in(key, 2), F, 3)
    np_ = _params(jax.random.fold_in(key, 3), F, 2)
    ep = jax.tree.map(jnp.asarray, ep)
    np_ = jax.tree.map(jnp.asarray, np_)

    def fwd_body(carry):
        x, e = carry
        xo, eo = fused_gn_block(x, e, ep, np_, t)
        return (xo, eo)

    scan_time(fwd_body, (x, e), label="fused block fwd")

    cot_x = jax.random.normal(key, x.shape, jnp.bfloat16)
    cot_e = jax.random.normal(key, e.shape, jnp.bfloat16)

    def fb_body(carry):
        x, e = carry

        def loss(x, e):
            xo, eo = fused_gn_block(x, e, ep, np_, t)
            return (
                jnp.sum(xo.astype(jnp.float32) * cot_x)
                + jnp.sum(eo.astype(jnp.float32) * cot_e)
            )

        gx, ge = jax.grad(loss, argnums=(0, 1))(x, e)
        return (x + (1e-6 * gx).astype(x.dtype), e + (1e-6 * ge).astype(e.dtype))

    scan_time(fb_body, (x, e), label="fused block fwd+bwd")

    def fb5_body(carry):
        x, e = carry

        def loss(x, e):
            for _ in range(5):
                x, e = fused_gn_block(x, e, ep, np_, t)
            return (
                jnp.sum(x.astype(jnp.float32) * cot_x)
                + jnp.sum(e.astype(jnp.float32) * cot_e)
            )

        gx, ge = jax.grad(loss, argnums=(0, 1))(x, e)
        return (x + (1e-6 * gx).astype(x.dtype), e + (1e-6 * ge).astype(e.dtype))

    per = scan_time(fb5_body, (x, e), k1=2, k2=8, label="5 fused blocks fwd+bwd")
    print(f"  -> implied graph-steps/s at B={B} for 5-block processor: "
          f"{B/per:.0f} (blocks only)")


if __name__ == "__main__":
    main()
