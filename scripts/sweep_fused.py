"""Sweep fused-kernel lane widths / batch on the bench workload.

One process, sequential variants, min-of-trials per variant (the tunnel is
time-shared). Usage: python scripts/sweep_fused.py
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import graph_physics_tpu.ops.fused_gnblock as fg
from __graft_entry__ import _cylinder_setup
from graph_physics_tpu.training.step import init_train_state, make_multi_step

orig = fg.fused_gn_block

def run(batch, lanes, lanes_bwd, inner=100, trials=6, budget=120, node_block=128):
    def patched(*a, **k):
        k["lanes"] = lanes
        k["lanes_bwd"] = lanes_bwd
        return orig(*a, **k)
    fg.fused_gn_block = patched
    import graph_physics_tpu.ops.tiling as tl
    orig_build = tl.build_edge_tiling.__wrapped__ if hasattr(tl.build_edge_tiling, "__wrapped__") else tl.build_edge_tiling
    import functools
    tl.build_edge_tiling = functools.partial(orig_build, node_block=node_block) if node_block != 128 else orig_build
    import graph_physics_tpu.models.layers as layers_mod
    # layers.py imports inside the function, so patching the module attr works
    try:
        sim, opt, step_fn, g = _cylinder_setup(
            nx=48, ny=40, hidden=32, mp_steps=5, batch=batch, packed=True, fused=True)
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
        multi = make_multi_step(step_fn, unroll=inner)
        rng = jax.random.PRNGKey(1)
        state, metrics = multi(state, g, rng)
        _ = float(np.asarray(metrics["loss"])[-1])
        best = float("inf")
        t_end = time.time() + budget
        n = 0
        while n < trials and time.time() < t_end:
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, metrics = multi(state, g, k)
            _ = float(np.asarray(metrics["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
            n += 1
        gps = inner * batch / best
        print(f"B={batch:4d} lanes={lanes:5d} lanes_bwd={lanes_bwd:5d} nb={node_block}: "
              f"{best/inner*1e3:7.2f} ms/step  {gps:8.0f} graph-steps/s", flush=True)
        return gps
    except Exception as e:
        print(f"B={batch} lanes={lanes} bwd={lanes_bwd}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return 0.0
    finally:
        fg.fused_gn_block = orig

if __name__ == "__main__":
    import sys
    for spec in sys.argv[1:]:
        parts = list(map(int, spec.split(",")))
        run(*parts[:3], node_block=parts[3] if len(parts) > 3 else 128)
