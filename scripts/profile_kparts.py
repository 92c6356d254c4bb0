"""Bisect the fused fwd kernel: which stage eats the time?

Variants (all on the bench shape, B=128, F=32, lanes param):
  a) passthrough: load e, xj, windows -> write xj, e        (DMA floor)
  b) gathers only: xs, xr one-hot matmuls -> write
  c) gathers + scatter
  d) gathers + edge MLP (reshape path) + scatter
  e) full block (fwd)
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from __graft_entry__ import _cylinder_setup
from graph_physics_tpu.ops import tiling as tiling_lib
from graph_physics_tpu.ops.fused_gnblock import (
    _dot, _dot_t, _group_ones, LANES,
)

B, F = 128, 32
sim, opt, _u, g = _cylinder_setup(nx=48, ny=40, hidden=F, mp_steps=5, batch=B, packed=True)
t = tiling_lib.build_edge_tiling(
    np.asarray(g.senders), np.asarray(g.receivers), g.x.shape[0],
    edge_mask=np.asarray(g.edge_mask), node_block=128, window_unit=128)
N, G, EMAX, WB = t.num_nodes, t.num_groups, t.edges_per_block, t.window_blocks
TOT = B * F

key = jax.random.PRNGKey(0)
x2 = jax.random.normal(key, (N, TOT), jnp.bfloat16)
e2 = jax.random.normal(key, (G * EMAX, TOT), jnp.bfloat16)
sidx = jnp.asarray(t.sidx)[:, None, :]
ridx = jnp.asarray(t.ridx)[:, None, :]
win_start = jnp.asarray(t.win_start)
wk = jax.random.normal(key, (128, 128), jnp.bfloat16) * 0.05


def make_variant(stage, lanes):
    chunks = TOT // lanes
    if stage in ("dwide", "ewide"):
        reps = lanes // 128
        wmat = jnp.kron(jnp.eye(reps, dtype=jnp.bfloat16), wk)
    else:
        wmat = wk

    def kern(ws_ref, sidx_ref, ridx_ref, xj_ref, *rest):
        xw_refs = rest[:WB]
        e_ref = rest[WB]
        w_ref = rest[WB + 1]
        xout_ref, eout_ref = rest[WB + 2:]
        k = lanes // LANES
        xj = xj_ref[:]
        e = e_ref[:]
        if stage == "a":
            xout_ref[:] = xj * 1.0001
            eout_ref[:] = e * 1.0001
            return
        xw = jnp.concatenate([r[:] for r in xw_refs], axis=0)
        sid = sidx_ref[0]
        rid = ridx_ref[0]
        oh_sT = (jax.lax.broadcasted_iota(jnp.int32, (WB * 128, EMAX), 0) == sid
                 ).astype(jnp.bfloat16)
        oh_rN = (jax.lax.broadcasted_iota(jnp.int32, (128, EMAX), 0) == rid
                 ).astype(jnp.bfloat16)
        xs = _dot_t(oh_sT, xw).astype(jnp.bfloat16)
        xr = _dot_t(oh_rN, xj).astype(jnp.bfloat16)
        if stage == "b":
            xout_ref[:] = xj
            eout_ref[:] = e + xs + xr
            return
        if stage == "c":
            agg = _dot(oh_rN, e).astype(jnp.bfloat16)
            xout_ref[:] = xj + agg
            eout_ref[:] = e + xs + xr
            return
        # d: + edge MLP via reshape; dwide: kron-wide weights, no reshape
        if stage in ("dwide", "ewide"):
            ww = w_ref[:]  # [lanes, lanes] block-diag
            h = _dot(e, ww) + _dot(xr, ww) + _dot(xs, ww)
            for _ in range(3):
                h = _dot(jax.nn.relu(h).astype(jnp.bfloat16), ww)
            eh = h.astype(jnp.bfloat16)
        else:
            er = e.reshape(EMAX * k, LANES)
            xrr = xr.reshape(EMAX * k, LANES)
            xsr = xs.reshape(EMAX * k, LANES)
            h = _dot(er, w_ref[:]) + _dot(xrr, w_ref[:]) + _dot(xsr, w_ref[:])
            for _ in range(3):
                h = _dot(jax.nn.relu(h).astype(jnp.bfloat16), w_ref[:])
            eh = h.astype(jnp.bfloat16).reshape(EMAX, lanes)
        agg = _dot(oh_rN, eh).astype(jnp.bfloat16)
        if stage in ("d", "dwide"):
            xout_ref[:] = xj + agg
            eout_ref[:] = e + eh
            return
        if stage == "ewide":
            ww = w_ref[:]
            hn = _dot(xj, ww) + _dot(agg, ww)
            for _ in range(3):
                hn = _dot(jax.nn.relu(hn).astype(jnp.bfloat16), ww)
            xout_ref[:] = xj + hn.astype(jnp.bfloat16)
            eout_ref[:] = e + eh
            return
        if stage == "e2x":
            for _rep in range(2):
                er = e.reshape(EMAX * k, LANES)
                xrr = xr.reshape(EMAX * k, LANES)
                xsr = xs.reshape(EMAX * k, LANES)
                h = _dot(er, w_ref[:]) + _dot(xrr, w_ref[:]) + _dot(xsr, w_ref[:])
                for _ in range(3):
                    h = _dot(jax.nn.relu(h).astype(jnp.bfloat16), w_ref[:])
                eh2 = h.astype(jnp.bfloat16).reshape(EMAX, lanes)
                agg2 = _dot(oh_rN, eh2).astype(jnp.bfloat16)
                xjr2 = xj.reshape(128 * k, LANES)
                aggr2 = agg2.reshape(128 * k, LANES)
                hn = _dot(xjr2, w_ref[:]) + _dot(aggr2, w_ref[:])
                for _ in range(3):
                    hn = _dot(jax.nn.relu(hn).astype(jnp.bfloat16), w_ref[:])
                xj = (xj + hn.astype(jnp.bfloat16).reshape(128, lanes)).astype(jnp.bfloat16)
                e = (e + eh2).astype(jnp.bfloat16)
            xout_ref[:] = xj
            eout_ref[:] = e
            return
        # e: + node MLP
        if stage in ("f32rms", "bf16rms"):
            ones = _group_ones(F)
            if stage == "bf16rms":
                gs_ = _dot(h.astype(jnp.bfloat16) ** 2, ones.astype(jnp.bfloat16))
            else:
                gs_ = _dot(h * h, ones)
            rms_ = jnp.sqrt(gs_ + 1e-24) * (1 / np.sqrt(F))
            h = h / (rms_ + 1e-8)
            eh = h.astype(jnp.bfloat16).reshape(EMAX, lanes)
        xjr = xj.reshape(128 * k, LANES)
        aggr = agg.reshape(128 * k, LANES)
        hn = _dot(xjr, w_ref[:]) + _dot(aggr, w_ref[:])
        for _ in range(3):
            hn = _dot(jax.nn.relu(hn).astype(jnp.bfloat16), w_ref[:])
        if stage in ("f32rms", "bf16rms"):
            ones = _group_ones(F)
            if stage == "bf16rms":
                gs_ = _dot(hn.astype(jnp.bfloat16) ** 2, ones.astype(jnp.bfloat16))
            else:
                gs_ = _dot(hn * hn, ones)
            rms_ = jnp.sqrt(gs_ + 1e-24) * (1 / np.sqrt(F))
            hn = hn / (rms_ + 1e-8)
        xout_ref[:] = xj + hn.astype(jnp.bfloat16).reshape(128, lanes)
        eout_ref[:] = e + eh

    nbuf = int(os.environ.get("KP_NBUF", "0"))
    def vs(shape, imap):
        if nbuf:
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM,
                                pipeline_mode=pl.Buffered(nbuf))
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunks, G),
        in_specs=[
            vs((1, 1, EMAX), lambda c, g, ws: (g, 0, 0)),
            vs((1, 1, EMAX), lambda c, g, ws: (g, 0, 0)),
            vs((128, lanes), lambda c, g, ws: (g, c)),
        ] + [
            vs((128, lanes), partial(lambda kk, c, g, ws: (ws[g, kk], c), kk))
            for kk in range(WB)
        ] + [
            vs((EMAX, lanes), lambda c, g, ws: (g, c)),
            vs(wmat.shape, lambda c, g, ws: (0, 0)),
        ],
        out_specs=[
            vs((128, lanes), lambda c, g, ws: (g, c)),
            vs((EMAX, lanes), lambda c, g, ws: (g, c)),
        ],
    )

    @jax.jit
    def run10(x2, e2):
        def body(c, _):
            x2, e2 = c
            xo, eo = pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=[jax.ShapeDtypeStruct((N, TOT), jnp.bfloat16),
                           jax.ShapeDtypeStruct((G * EMAX, TOT), jnp.bfloat16)],
            )(win_start, sidx, ridx, x2, *([x2] * WB), e2, wmat)
            return (xo, eo), None

        (x2, e2), _ = jax.lax.scan(body, (x2, e2), None, length=50)
        return x2.astype(jnp.float32).ravel()[0] + e2.astype(jnp.float32).ravel()[0]

    return run10


for lanes in (256,):
    for stage in ["a", "e"]:
        try:
            f = make_variant(stage, lanes)
            _ = float(f(x2, e2))
            best = 1e9
            for _ in range(4):
                t0 = time.perf_counter()
                _ = float(f(x2, e2))
                best = min(best, time.perf_counter() - t0)
            print(f"lanes={lanes} stage={stage}: {best/50*1e3:7.3f} ms/block", flush=True)
        except Exception as ex:
            print(f"lanes={lanes} stage={stage}: FAIL {str(ex)[:120]}", flush=True)
