"""A/B microbenchmark: blocked-CSR vs uniform-degree (NK) fused attention.

Transformer workload shape (cylinder mesh 48x40, B=64, hidden 64, 4
heads): fwd+bwd of each attention kernel in a lax.scan chain, min over
trials. Run on the real TPU (tunnel): host timings of single dispatches
are meaningless — see BASELINE.md timing protocol.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
if os.environ.get("JAX_PLATFORMS"):  # env var ignored by this jax build
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from graph_physics_tpu.core import mesh as mesh_lib
from graph_physics_tpu.dataset import synthetic
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_edge_attention import fused_edge_attention
from graph_physics_tpu.ops.fused_edge_attention_nk import (
    build_nk_tiling,
    fused_edge_attention_nk,
)

ON_TPU = jax.default_backend() == "tpu"
B, H, DH = (64, 4, 16) if ON_TPU else (2, 4, 16)
INNER = 50 if ON_TPU else 2  # CPU interpret mode: smoke only
TRIALS = 6 if ON_TPU else 1

traj = synthetic.make_trajectory(*(48, 40) if ON_TPU else (14, 10),
                                 num_steps=2)
pos = traj["mesh_pos"][0]
senders, receivers = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
t_csr = tiling_lib.build_edge_tiling(senders, receivers, len(pos))
t_nk = build_nk_tiling(senders, receivers, len(pos))
assert t_csr is not None and t_nk is not None
n = t_csr.num_nodes
assert t_nk.num_nodes == n
print(f"nodes {n}  edges {len(senders)}  csr: G={t_csr.num_groups} "
      f"Emax={t_csr.edges_per_block} wb={t_csr.window_blocks} | "
      f"nk: K={t_nk.k_slots} slots={t_nk.slots} wb={t_nk.window_blocks} "
      f"(row inflation {t_nk.slots * t_nk.num_groups / len(senders):.2f}x)")

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (n, B, H, DH), jnp.float32) * 0.5
k = jax.random.normal(jax.random.fold_in(key, 1), q.shape) * 0.5
v = jax.random.normal(jax.random.fold_in(key, 2), q.shape) * 0.5
cot = jax.random.normal(jax.random.fold_in(key, 3), q.shape)


def chain(attn):
    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) * cot)

    vg = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            q, k, v = carry
            val, (dq, dk, dv) = vg(q, k, v)
            eps = 1e-6 * val
            return (q + eps * dq.astype(q.dtype),
                    k + eps * dk.astype(k.dtype),
                    v + eps * dv.astype(v.dtype)), val

        (q, k, v), vals = jax.lax.scan(body, (q, k, v), None, length=INNER)
        return q, vals[-1]

    return run


def bench(name, attn):
    run = chain(attn)
    qq, val = run(q, k, v)  # compile + warm
    _ = float(np.asarray(val))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        qq, val = run(q, k, v)
        _ = float(np.asarray(val))
        best = min(best, time.perf_counter() - t0)
    ms = best / INNER * 1e3
    print(f"{name:24s} {ms:7.3f} ms/iter (fwd+bwd, B={B})  "
          f"graph-equiv {B / (best / INNER):,.0f}/s")
    return ms


csr = bench("blocked-CSR attention", lambda a, b, c: fused_edge_attention(
    a, b, c, t_csr, interpret=jax.default_backend() != "tpu"))
nk = bench("uniform-degree (NK)", lambda a, b, c: fused_edge_attention_nk(
    a, b, c, t_nk, interpret=jax.default_backend() != "tpu"))
print(f"NK speedup: {csr / nk:.2f}x")
