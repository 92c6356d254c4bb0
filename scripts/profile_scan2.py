"""Round 2 profiling: concat-free block formulation + non-block cost breakdown."""

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
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
    g = jax.tree.map(jnp.asarray, g)
    N, E = g.x.shape[0], g.senders.shape[0]
    print(f"N={N} E={E} B={B}")

    key = jax.random.PRNGKey(0)
    senders = g.senders
    receivers = g.receivers
    x = jax.random.normal(key, (N, B, 32), jnp.bfloat16)
    e = jax.random.normal(key, (E, B, 32), jnp.bfloat16)

    w1e = jax.random.normal(key, (32, 32), jnp.bfloat16)
    w1r = jax.random.normal(key, (32, 32), jnp.bfloat16)
    w1s = jax.random.normal(key, (32, 32), jnp.bfloat16)
    w = jax.random.normal(key, (32, 32), jnp.bfloat16)
    wn1x = jax.random.normal(key, (32, 32), jnp.bfloat16)
    wn1a = jax.random.normal(key, (32, 32), jnp.bfloat16)

    def block_nocat(carry):
        x, e = carry
        xs = jnp.take(x, senders, axis=0)
        xr = jnp.take(x, receivers, axis=0)
        h = jax.nn.relu(e @ w1e + xr @ w1r + xs @ w1s)
        h = jax.nn.relu(h @ w)
        h = jax.nn.relu(h @ w)
        h = h @ w
        agg = jax.ops.segment_sum(h, receivers, num_segments=N)
        hn = jax.nn.relu(x @ wn1x + agg @ wn1a)
        hn = jax.nn.relu(hn @ w)
        hn = jax.nn.relu(hn @ w)
        hn = hn @ w
        return (x + hn, e + h)

    scan_time(block_nocat, (x, e), label="1 block fwd, concat-free")

    def grad_of(body):
        def g_body(carry):
            x, e = carry

            def lossf(x, e):
                nx_, ne_ = body((x, e))
                return nx_.astype(jnp.float32).sum() + ne_.astype(jnp.float32).sum()

            gx, ge = jax.grad(lossf, argnums=(0, 1))(x, e)
            return (x + 1e-6 * gx.astype(x.dtype), e + 1e-6 * ge.astype(e.dtype))

        return g_body

    scan_time(grad_of(block_nocat), (x, e), label="1 block fwd+bwd, concat-free")

    # gather fused into matmul? isolate: matmul on gathered rows
    def gmm(carry):
        x, e = carry
        xs = jnp.take(x, senders, axis=0)
        return (x, e * 0.999 + xs @ w1s)

    scan_time(gmm, (x, e), label="take->matmul only")

    def segmm(carry):
        x, e = carry
        agg = jax.ops.segment_sum(e, receivers, num_segments=N)
        return (x * 0.999 + agg @ wn1a, e)

    scan_time(segmm, (x, e), label="segsum->matmul only")

    # with RMSNorm tails (the real MLP has one at the end)
    def rms(v, d=32):
        vf = v.astype(jnp.float32)
        r = jnp.sqrt(jnp.sum(vf * vf, -1, keepdims=True) + 1e-24) / np.sqrt(d)
        return (vf / (r + 1e-8)).astype(v.dtype)

    def block_nocat_norm(carry):
        x, e = carry
        xs = jnp.take(x, senders, axis=0)
        xr = jnp.take(x, receivers, axis=0)
        h = jax.nn.relu(e @ w1e + xr @ w1r + xs @ w1s)
        h = jax.nn.relu(h @ w)
        h = jax.nn.relu(h @ w)
        h = rms(h @ w)
        agg = jax.ops.segment_sum(h, receivers, num_segments=N)
        hn = jax.nn.relu(x @ wn1x + agg @ wn1a)
        hn = jax.nn.relu(hn @ w)
        hn = jax.nn.relu(hn @ w)
        hn = rms(hn @ w)
        return (x + hn, e + h)

    scan_time(block_nocat_norm, (x, e), label="1 block fwd concat-free +rms")
    scan_time(grad_of(block_nocat_norm), (x, e), label="1 block fwd+bwd concat-free +rms")

    # ---- non-block cost: train step with mp_steps=0-equivalent ----
    for mp in (0, 5):
        sim2, opt2, _uu, g2 = _cylinder_setup(
            nx=48, ny=40, hidden=32, mp_steps=mp, batch=B, packed=True
        )
        noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))
        step2 = make_train_step(sim2, opt2, LossType.L2LOSS, noise, num_steps=10000, donate=False)
        st2 = init_train_state(sim2, opt2, jax.random.PRNGKey(0), g2)
        g2 = jax.tree.map(jnp.asarray, g2)
        body2 = step2._step_body
        rng = jax.random.PRNGKey(1)

        def sbody(carry, body2=body2, g2=g2, rng=rng):
            st, i = carry
            new_state, _m = body2(st, g2, jax.random.fold_in(rng, i))
            return (new_state, i + 1)

        scan_time(sbody, (st2, jnp.zeros((), jnp.int32)), k1=2, k2=10,
                  label=f"full train step mp={mp}")

    # fp32 params? check param dtype and where time goes in fwd only vs bwd
    print("param dtype:", jax.tree.leaves(state.params)[0].dtype)


if __name__ == "__main__":
    main()
