"""A/B the non-kernel glue of the NK fused train step on the TPU.

The round-4 NK trace (25.5 ms/step) shows kernels at 23.8 ms — at their
issued-flop floor — leaving ~1.7 ms/step of XLA glue + gaps (noise RNG,
metric stacking, loop-carried copies). This sweeps the candidate cuts:

  base          current bench program (reference point)
  nonoise       noise injection disabled (diagnostic ceiling, NOT a
                legitimate bench configuration)
  rbg           jax_default_prng_impl=rbg (TPU-native generator for the
                noise draw; still N(0, sigma) gaussian noise)
  last_metrics  scan returns only the final step's metrics instead of
                stacking [K] per-step metric arrays

Usage: python scripts/sweep_glue.py [variant ...]  (default: all)
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

VARIANTS = ("base", "nonoise", "rbg", "last_metrics")


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    want = sys.argv[1:] or list(VARIANTS)
    if "rbg" in want:
        # must be set before any PRNG key is created
        jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _cylinder_setup
    from bench import SETUP_KWARGS
    from graph_physics_tpu.training.step import (
        init_train_state,
        make_multi_step,
    )

    batch = int(os.environ.get("BENCH_B", "128"))
    inner = 200

    def measure(name, step_fn, sim, opt, batch_graph, multi=None):
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch_graph)
        batch_graph = jax.device_put(batch_graph)
        multi = multi or make_multi_step(step_fn, unroll=inner)
        rng = jax.random.PRNGKey(1)
        state, m = multi(state, batch_graph, rng)
        _ = float(np.asarray(jax.tree.leaves(m)[0]).ravel()[-1])
        best = float("inf")
        deadline = time.time() + 90
        trials = 0
        while time.time() < deadline and trials < 12:
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, m = multi(state, batch_graph, k)
            _ = float(np.asarray(jax.tree.leaves(m)[0]).ravel()[-1])
            best = min(best, time.perf_counter() - t0)
            trials += 1
        gps = inner * batch / best
        print(json.dumps({"variant": name, "graphs_per_sec": round(gps, 1),
                          "ms_per_step": round(best / inner * 1e3, 3),
                          "trials": trials}), flush=True)

    if "base" in want or "rbg" in want:
        name = "rbg" if "rbg" in want else "base"
        sim, opt, step_fn, g = _cylinder_setup(
            batch=batch, gn_nk=True, **SETUP_KWARGS)
        measure(name, step_fn, sim, opt, g)

    if "nonoise" in want:
        import graph_physics_tpu.training.step as step_mod
        from graph_physics_tpu.training.loss import LossType
        from graph_physics_tpu.training import schedule

        sim, opt, _, g = _cylinder_setup(
            batch=batch, gn_nk=True, **SETUP_KWARGS)
        step_fn = step_mod.make_train_step(
            sim, opt, LossType.L2LOSS, None, num_steps=10000)
        measure("nonoise", step_fn, sim, opt, g)

    if "last_metrics" in want:
        import jax.numpy as jnp

        sim, opt, step_fn, g = _cylinder_setup(
            batch=batch, gn_nk=True, **SETUP_KWARGS)
        body = getattr(step_fn, "_step_body", step_fn)

        @partial(jax.jit, donate_argnums=(0,))
        def multi_last(state, batch, rng):
            keys = jax.random.split(rng, inner)

            def scan_body(carry, key):
                new_state, metrics = body(carry, batch, key)
                return new_state, None

            state, _ = jax.lax.scan(scan_body, state, keys)
            # one final metric read so the loss is still materialized
            return state, {"loss": state.step.astype(jnp.float32)}

        measure("last_metrics", step_fn, sim, opt, g, multi=multi_last)


if __name__ == "__main__":
    main()
