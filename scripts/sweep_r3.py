"""Round-3 lane sweep: folded-block0 caps x lanes_bwd on the bench shape."""
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

def run(name, fold_l, fold_lb, lanes, lanes_bwd, inner=100, budget=110):
    fg.FOLDED_LANES_CAP = fold_l
    fg.FOLDED_LANES_BWD_CAP = fold_lb
    def patched(*a, **k):
        k["lanes"] = lanes
        k["lanes_bwd"] = lanes_bwd
        return orig(*a, **k)
    fg.fused_gn_block = patched
    try:
        sim, opt, step_fn, g = _cylinder_setup(
            nx=48, ny=40, hidden=32, mp_steps=5, batch=128, packed=True, fused=True)
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
        multi = make_multi_step(step_fn, unroll=inner)
        rng = jax.random.PRNGKey(1)
        state, metrics = multi(state, g, rng)
        _ = float(np.asarray(metrics["loss"])[-1])
        best = float("inf")
        deadline = time.time() + budget
        while time.time() < deadline:
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, metrics = multi(state, g, k)
            _ = float(np.asarray(metrics["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {inner*128/best:.0f} graphs/s  ({best*1e3/inner:.2f} ms/step)",
              flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        fg.fused_gn_block = orig

import sys as _s
which = _s.argv[1] if len(_s.argv) > 1 else "all"
if which in ("all", "a"):
    run("baseline(512/128,1024/256)", 512, 128, 1024, 256)
if which in ("all", "b"):
    run("fold_bwd256(512/256,1024/256)", 512, 256, 1024, 256)
if which in ("all", "c"):
    run("bwd512(512/128,1024/512)", 512, 128, 1024, 512)
if which in ("all", "d"):
    run("fold1024_bwd256(1024/256,1024/512)", 1024, 256, 1024, 512)
