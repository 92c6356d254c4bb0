"""Scan-amortized per-op timing: true device compute, latency excluded.

Each candidate op is iterated K times inside one lax.scan inside one jit;
per-iter time = (t(K2) - t(K1)) / (K2 - K1) cancels dispatch overhead.
"""

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
    """Time body iterated k1 and k2 times inside jit; return per-iter ms."""

    def run(k):
        @jax.jit
        def f(c):
            c, _ = jax.lax.scan(lambda c, _: (make_body(c), None), c, None, length=k)
            # tiny scalar output forces a real device fetch on the tunnel
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
    print(f"{label:58s} {per*1e3:9.3f} ms/iter   (k{k1}={t1*1e3:.0f}ms k{k2}={t2*1e3:.0f}ms)")
    return per


def main():
    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import (
        NoiseConfig,
        init_train_state,
        make_train_step,
    )

    B = 128
    sim, opt, _u, g = _cylinder_setup(
        nx=48, ny=40, hidden=32, mp_steps=5, batch=B, packed=True
    )
    noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))
    step_fn = make_train_step(
        sim, opt, LossType.L2LOSS, noise, num_steps=10000, donate=False
    )
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
    g = jax.tree.map(jnp.asarray, g)
    N, E = g.x.shape[0], g.senders.shape[0]
    print(f"N={N} E={E} B={B}")

    key = jax.random.PRNGKey(0)
    senders = jnp.asarray(np.asarray(g.senders))
    receivers = jnp.asarray(np.asarray(g.receivers))

    # --- roofline: HBM copy bandwidth ---
    big = jax.random.normal(key, (4096, 8192), jnp.bfloat16)  # 64MB

    def copy_body(c):
        return c * 1.000001

    per = scan_time(copy_body, big, label="copy 64MB bf16 (128MB traffic)")
    print(f"    -> HBM BW ~ {2*big.size*2/per/1e9:.0f} GB/s")

    # --- full train step ---
    body = step_fn._step_body
    rngs = jax.random.split(key, 32)

    def step_body(carry):
        st, i = carry
        new_state, _m = body(st, g, rngs[0])
        return (new_state, i + 1)

    scan_time(step_body, (state, jnp.zeros((), jnp.int32)), k1=2, k2=10,
              label="FULL train step")

    x = jax.random.normal(key, (N, B, 32), jnp.bfloat16)
    e = jax.random.normal(key, (E, B, 32), jnp.bfloat16)

    def gather_body(c):
        y = jnp.take(c, senders, axis=0)
        return c + jax.ops.segment_sum(y, receivers, num_segments=N)

    scan_time(gather_body, x, label="gather+segsum roundtrip [E,B,32]")

    def gather_only(c):
        y = jnp.take(c, senders, axis=0)
        return c * 0.999 + y[:N]

    scan_time(gather_only, x, label="gather only")

    w1 = jax.random.normal(key, (96, 32), jnp.bfloat16)
    w = jax.random.normal(key, (32, 32), jnp.bfloat16)
    wn1 = jax.random.normal(key, (64, 32), jnp.bfloat16)

    def mlp_body(c):
        h = jax.nn.relu(c @ w)
        h = jax.nn.relu(h @ w)
        h = jax.nn.relu(h @ w)
        return h @ w

    scan_time(mlp_body, e, label="4-layer edge MLP [E,B,32]")

    def rms_body(c):
        cf = c.astype(jnp.float32)
        r = jnp.sqrt(jnp.sum(cf * cf, -1, keepdims=True) + 1e-24) / np.sqrt(32)
        return (cf / (r + 1e-8)).astype(jnp.bfloat16)

    scan_time(rms_body, e, label="RMSNorm fp32 [E,B,32]")

    def block_body(carry):
        x, e = carry
        xs = jnp.take(x, senders, axis=0)
        xr = jnp.take(x, receivers, axis=0)
        h = jnp.concatenate([e, xr, xs], axis=-1)
        h = jax.nn.relu(h @ w1)
        h = jax.nn.relu(h @ w)
        h = jax.nn.relu(h @ w)
        h = h @ w
        agg = jax.ops.segment_sum(h, receivers, num_segments=N)
        hn = jnp.concatenate([x, agg], axis=-1)
        hn = jax.nn.relu(hn @ wn1)
        hn = jax.nn.relu(hn @ w)
        hn = jax.nn.relu(hn @ w)
        hn = hn @ w
        return (x + hn, e + h)

    scan_time(block_body, (x, e), label="1 raw GraphNetBlock fwd")

    def block_grad_body(carry):
        x, e = carry

        def lossf(x, e):
            nx_, ne_ = block_body((x, e))
            return (nx_.astype(jnp.float32).sum() + ne_.astype(jnp.float32).sum())

        gx, ge = jax.grad(lossf, argnums=(0, 1))(x, e)
        return (x + 1e-6 * gx.astype(x.dtype), e + 1e-6 * ge.astype(e.dtype))

    scan_time(block_grad_body, (x, e), label="1 raw GraphNetBlock fwd+bwd")

    # forward of the real model only
    params = state.params
    sim_state = state.sim_state

    def fwd_body(carry):
        xg, i = carry
        g2 = g.replace(x=xg)
        g_in, target, pre_t, st = sim.prepare(sim_state, g2, is_training=True)
        out = sim.apply_model(params, g_in)
        return (xg + 1e-9 * out[..., :4].astype(xg.dtype) * 0, i + 1)

    gx = jnp.asarray(np.asarray(g.x))
    scan_time(fwd_body, (gx, jnp.zeros((), jnp.int32)), k1=2, k2=10,
              label="real model forward (prepare+apply)")


if __name__ == "__main__":
    main()
