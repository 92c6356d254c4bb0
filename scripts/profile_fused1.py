"""Minimal fused-kernel TPU probe: compile + time fwd, then fwd+bwd."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from __graft_entry__ import _cylinder_setup
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_gnblock import fused_gn_block
from tests.test_fused_gnblock import _params

B, F = 128, 32
sim, opt, _u, g = _cylinder_setup(nx=48, ny=40, hidden=F, mp_steps=5, batch=B, packed=True)
t = tiling_lib.build_edge_tiling(
    np.asarray(g.senders), np.asarray(g.receivers), g.x.shape[0],
    edge_mask=np.asarray(g.edge_mask), node_block=128)
print(f"N={t.num_nodes} G={t.num_groups} emax={t.edges_per_block} wb={t.window_blocks}",
      flush=True)

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (t.num_nodes, B, F), jnp.bfloat16)
e = jax.random.normal(key, (t.num_groups * t.edges_per_block, B, F), jnp.bfloat16)
ep = jax.tree.map(jnp.asarray, _params(jax.random.fold_in(key, 2), F, 3))
np_ = jax.tree.map(jnp.asarray, _params(jax.random.fold_in(key, 3), F, 2))


@jax.jit
def fwd10(x, e):
    def body(c, _):
        x, e = c
        return fused_gn_block(x, e, ep, np_, t), None

    (x, e), _ = jax.lax.scan(body, (x, e), None, length=10)
    return x.astype(jnp.float32).ravel()[0] + e.astype(jnp.float32).ravel()[0]


t0 = time.time()
print("fwd10 first:", float(fwd10(x, e)), f"(compile+run {time.time()-t0:.1f}s)", flush=True)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    _ = float(fwd10(x, e))
    best = min(best, time.perf_counter() - t0)
print(f"fwd 10 iters: {best*1e3:.1f} ms -> {best*100:.2f} ms/block-fwd... "
      f"per-iter {best/10*1e3:.3f} ms", flush=True)

cot_x = jax.random.normal(key, x.shape, jnp.bfloat16)
cot_e = jax.random.normal(key, e.shape, jnp.bfloat16)


@jax.jit
def fb10(x, e):
    def body(c, _):
        x, e = c

        def loss(x, e):
            xo, eo = fused_gn_block(x, e, ep, np_, t)
            return (jnp.sum(xo.astype(jnp.float32) * cot_x)
                    + jnp.sum(eo.astype(jnp.float32) * cot_e))

        gx, ge = jax.grad(loss, argnums=(0, 1))(x, e)
        return (x + (1e-6 * gx).astype(x.dtype), e + (1e-6 * ge).astype(e.dtype)), None

    (x, e), _ = jax.lax.scan(body, (x, e), None, length=10)
    return x.astype(jnp.float32).ravel()[0] + e.astype(jnp.float32).ravel()[0]


t0 = time.time()
print("fb10 first:", float(fb10(x, e)), f"(compile+run {time.time()-t0:.1f}s)", flush=True)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    _ = float(fb10(x, e))
    best = min(best, time.perf_counter() - t0)
print(f"fwd+bwd per-iter {best/10*1e3:.3f} ms/block", flush=True)
print(f"-> est. 5-block processor fwd+bwd: {best/10*5*1e3:.1f} ms; "
      f"graph-steps/s at B=128: {128/(best/10*5):.0f} (blocks only)", flush=True)
