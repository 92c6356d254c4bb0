"""Ablation profiler for the packed cylinder train step.

Times isolated pieces of the hot path on the real TPU to locate where the
105 ms (B=128) goes: gathers, segment_sum, MLP chains, fwd vs fwd+bwd.
Run:  python scripts/profile_step.py
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


def timeit(fn, *args, reps=8, label=""):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]  # force fetch
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best*1e3:9.3f} ms")
    return best


def main():
    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.training.step import init_train_state, make_multi_step

    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.step import NoiseConfig, make_train_step

    B = 128
    sim, opt, _unused, g = _cylinder_setup(
        nx=48, ny=40, hidden=32, mp_steps=5, batch=B, packed=True
    )
    noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))
    step_fn = make_train_step(
        sim, opt, LossType.L2LOSS, noise, num_steps=10000, donate=False
    )
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
    rng = jax.random.PRNGKey(1)

    N = g.x.shape[0]
    E = g.senders.shape[0]
    print(f"N={N} E={E} B={B} hidden=32 mp=5")

    # 1. full train step (single)
    timeit(lambda: step_fn(state, g, rng), label="full train step (1 step, B=128)")

    # 2. multi-step amortized (non-donating variant for repeat timing)
    body = step_fn._step_body

    @jax.jit
    def multi(state, batch, rng):
        keys = jax.random.split(rng, 10)

        def scan_body(carry, key):
            new_state, metrics = body(carry, batch, key)
            return new_state, metrics

        return jax.lax.scan(scan_body, state, keys)

    t = timeit(lambda: multi(state, g, rng), label="multi step (10 inner)")
    print(f"   -> per-step {t/10*1e3:.2f} ms, graph-steps/s = {10*B/t:.0f}")

    # 3. forward only (no grad)
    params = state.params
    sim_state = state.sim_state

    @jax.jit
    def fwd(params, graph):
        g_in, target, pre_t, st = sim.prepare(sim_state, graph, is_training=True)
        return sim.apply_model(params, g_in).sum()

    timeit(lambda: fwd(params, g), label="forward only")

    @jax.jit
    def fwdbwd(params, graph):
        def loss(p):
            g_in, target, pre_t, st = sim.prepare(sim_state, graph, is_training=True)
            out = sim.apply_model(p, g_in)
            return ((out - target) ** 2).mean()

        l, gr = jax.value_and_grad(loss)(params)
        return l

    timeit(lambda: fwdbwd(params, g), label="forward+backward (no opt)")

    # 4. isolated primitives at hot-path shapes, bf16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, B, 32), jnp.bfloat16)
    e = jax.random.normal(key, (E, B, 32), jnp.bfloat16)
    senders = jnp.asarray(np.asarray(g.senders))
    receivers = jnp.asarray(np.asarray(g.receivers))

    @jax.jit
    def gather(x):
        return jnp.take(x, senders, axis=0).sum()

    timeit(lambda: gather(x), label=f"1x gather [N,B,32]->[E,B,32] ({E*B*32*2/1e6:.0f}MB out)")

    @jax.jit
    def seg(e):
        return jax.ops.segment_sum(e, receivers, num_segments=N).sum()

    timeit(lambda: seg(e), label="1x segment_sum [E,B,32]->[N,B,32]")

    # 5. one full GraphNetBlock-equivalent: 2 gathers + concat + 4-layer MLP + scatter + node MLP
    w1 = jax.random.normal(key, (96, 32), jnp.bfloat16)
    w = jax.random.normal(key, (32, 32), jnp.bfloat16)
    wn1 = jax.random.normal(key, (64, 32), jnp.bfloat16)

    @jax.jit
    def block(x, e):
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
        return (x + hn).sum() + (e + h).sum()

    t = timeit(lambda: block(x, e), label="1 raw GraphNetBlock fwd (no norm)")

    @jax.jit
    def block5(x, e):
        def body(carry, _):
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
            return (x + hn, e + h), None

        (x, e), _ = jax.lax.scan(body, (x, e), None, length=5)
        return x.sum() + e.sum()

    timeit(lambda: block5(x, e), label="5 raw blocks fwd")

    @jax.jit
    def block5_grad(x, e):
        return jax.grad(lambda x, e: block5(x, e), argnums=(0, 1))(x, e)[0].sum()

    timeit(lambda: block5_grad(x, e), label="5 raw blocks fwd+bwd")

    # 6. edge MLP chain alone (no gather/scatter): is it matmul- or traffic-bound?
    h0 = jax.random.normal(key, (E * B, 96), jnp.bfloat16)

    @jax.jit
    def mlp(h0):
        h = jax.nn.relu(h0 @ w1)
        h = jax.nn.relu(h @ w)
        h = jax.nn.relu(h @ w)
        return (h @ w).sum()

    timeit(lambda: mlp(h0), label=f"edge MLP chain [{E*B},96->32x4]")

    # 7. fp32 comparison of gather
    x32 = x.astype(jnp.float32)

    @jax.jit
    def gather32(x):
        return jnp.take(x, senders, axis=0).sum()

    timeit(lambda: gather32(x32), label="1x gather fp32")

    # 8. RMSNorm-at-fp32 cost on edge tensor
    @jax.jit
    def rms(e):
        ef = e.astype(jnp.float32)
        r = jnp.sqrt(jnp.sum(ef * ef, -1, keepdims=True) + 1e-24) / np.sqrt(32)
        return (ef / (r + 1e-8)).astype(jnp.bfloat16).sum()

    timeit(lambda: rms(e), label="RMSNorm over [E,B,32]")

    # 9. B scaling
    for b2 in (256,):
        x2 = jax.random.normal(key, (N, b2, 32), jnp.bfloat16)
        e2 = jax.random.normal(key, (E, b2, 32), jnp.bfloat16)
        t = timeit(lambda: block5_grad(x2, e2), label=f"5 raw blocks fwd+bwd B={b2}")


if __name__ == "__main__":
    main()
