"""Hand-rolled DMA pipeline vs Mosaic's auto-pipeliner on the stage-e
workload (gathers + edge MLP + scatter + node MLP). If the manual ring
overlaps DMA with the dependent matmul chain, total -> max(DMA, compute)
instead of the sum."""

import os, sys, time
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
from graph_physics_tpu.ops.fused_gnblock import _dot, _dot_t, LANES

B, F = 128, 32
sim, opt, _u, g = _cylinder_setup(nx=48, ny=40, hidden=F, mp_steps=5, batch=B, packed=True)
t = tiling_lib.build_edge_tiling(
    np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
    edge_mask=np.asarray(g.edge_mask), node_block=128, window_unit=128)
N, G, EMAX, WB = t.num_nodes, t.num_groups, t.edges_per_block, t.window_blocks
TOT = B * F
print(f"N={N} G={G} EMAX={EMAX} WB={WB}", flush=True)

key = jax.random.PRNGKey(0)
x2 = jax.random.normal(key, (N, TOT), jnp.bfloat16)
e2 = jax.random.normal(key, (G * EMAX, TOT), jnp.bfloat16)
sidx = jnp.asarray(t.sidx, jnp.int32)          # [G, EMAX]
ridx = jnp.asarray(t.ridx, jnp.int32)
win_start = jnp.asarray(t.win_start, jnp.int32)  # [G]
wk = jax.random.normal(key, (128, 128), jnp.bfloat16) * 0.05


def compute_block(e, xj, xw, sid, rid, w, lanes):
    k = lanes // LANES
    oh_sT = (jax.lax.broadcasted_iota(jnp.int32, (WB * 128, EMAX), 0) == sid[None, :]
             ).astype(jnp.bfloat16)
    oh_rN = (jax.lax.broadcasted_iota(jnp.int32, (128, EMAX), 0) == rid[None, :]
             ).astype(jnp.bfloat16)
    xs = _dot_t(oh_sT, xw).astype(jnp.bfloat16)
    xr = _dot_t(oh_rN, xj).astype(jnp.bfloat16)
    er = e.reshape(EMAX * k, LANES)
    xrr = xr.reshape(EMAX * k, LANES)
    xsr = xs.reshape(EMAX * k, LANES)
    h = _dot(er, w) + _dot(xrr, w) + _dot(xsr, w)
    for _ in range(3):
        h = _dot(jax.nn.relu(h).astype(jnp.bfloat16), w)
    eh = h.astype(jnp.bfloat16).reshape(EMAX, lanes)
    agg = _dot(oh_rN, eh).astype(jnp.bfloat16)
    xjr = xj.reshape(128 * k, LANES)
    aggr = agg.reshape(128 * k, LANES)
    hn = _dot(xjr, w) + _dot(aggr, w)
    for _ in range(3):
        hn = _dot(jax.nn.relu(hn).astype(jnp.bfloat16), w)
    return (xj + hn.astype(jnp.bfloat16).reshape(128, lanes), e + eh)


def make_manual(lanes):
    chunks = TOT // lanes
    steps = chunks * G

    def kernel(ws_ref, sidx_ref, ridx_ref, x_ref, e_ref, w_ref,
               xout_ref, eout_ref,
               e_in, xj_in, xw_in, x_ob, e_ob, in_sems, out_sems):
        NB = 2
        w = w_ref[:]

        def in_dmas(slot, tt):
            c = tt // G
            gg = tt % G
            # first window unit; the manual variant predates arbitrary
            # units and assumes CONSECUTIVE units — true for the banded
            # grid mesh this script hardcodes (window_unit=128)
            ws = ws_ref[gg, 0]
            return [
                pltpu.make_async_copy(
                    e_ref.at[pl.ds(gg * EMAX, EMAX), pl.ds(c * lanes, lanes)],
                    e_in.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(gg * 128, 128), pl.ds(c * lanes, lanes)],
                    xj_in.at[slot], in_sems.at[slot, 1]),
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(ws * 128, WB * 128), pl.ds(c * lanes, lanes)],
                    xw_in.at[slot], in_sems.at[slot, 2]),
            ]

        def out_dmas(slot, tt):
            c = tt // G
            gg = tt % G
            return [
                pltpu.make_async_copy(
                    x_ob.at[slot],
                    xout_ref.at[pl.ds(gg * 128, 128), pl.ds(c * lanes, lanes)],
                    out_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    e_ob.at[slot],
                    eout_ref.at[pl.ds(gg * EMAX, EMAX), pl.ds(c * lanes, lanes)],
                    out_sems.at[slot, 1]),
            ]

        for d in in_dmas(0, 0):
            d.start()

        def body(tt, _):
            slot = jax.lax.rem(tt, NB)
            nslot = jax.lax.rem(tt + 1, NB)

            @pl.when(tt + 1 < steps)
            def _():
                for d in in_dmas(nslot, tt + 1):
                    d.start()

            for d in in_dmas(slot, tt):
                d.wait()

            # output buffers for this slot must be free (DMA from tt-NB done)
            @pl.when(tt >= NB)
            def _():
                for d in out_dmas(slot, tt - NB):
                    d.wait()

            gg = jax.lax.rem(tt, G)
            sid = sidx_ref[gg]
            rid = ridx_ref[gg]
            xo, eo = compute_block(
                e_in[slot], xj_in[slot], xw_in[slot], sid, rid, w, lanes)
            x_ob[slot] = xo
            e_ob[slot] = eo
            for d in out_dmas(slot, tt):
                d.start()
            return ()

        jax.lax.fori_loop(0, steps, body, (), unroll=False)
        # drain the last NB output DMAs
        for tt in range(NB):
            idx = steps - NB + tt
            slot = idx % NB
            for d in out_dmas(slot, idx):
                d.wait()

    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # win_start
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sidx
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ridx
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # e (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, TOT), jnp.bfloat16),
            jax.ShapeDtypeStruct((G * EMAX, TOT), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, EMAX, lanes), jnp.bfloat16),
            pltpu.VMEM((2, 128, lanes), jnp.bfloat16),
            pltpu.VMEM((2, WB * 128, lanes), jnp.bfloat16),
            pltpu.VMEM((2, 128, lanes), jnp.bfloat16),
            pltpu.VMEM((2, EMAX, lanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return f


def timeit(fn, label, reps=4, inner=200):
    @jax.jit
    def run(x2, e2):
        def body(c, _):
            x2, e2 = c
            xo, eo = fn(x2, e2)
            return (xo, eo), None
        (xo, eo), _ = jax.lax.scan(body, (x2, e2), None, length=inner)
        return xo.astype(jnp.float32).ravel()[0] + eo.astype(jnp.float32).ravel()[0]

    _ = float(run(x2, e2))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(x2, e2))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/inner*1e3:7.3f} ms/block", flush=True)


def make_auto(lanes):
    chunks = TOT // lanes

    def kern(ws_ref, sidx_ref, ridx_ref, xj_ref, *rest):
        xw_refs = rest[:WB]
        e_ref = rest[WB]
        w_ref = rest[WB + 1]
        xout_ref, eout_ref = rest[WB + 2:]
        xw = jnp.concatenate([r[:] for r in xw_refs], axis=0)
        sid = sidx_ref[0, 0]
        rid = ridx_ref[0, 0]
        xo, eo = compute_block(e_ref[:], xj_ref[:], xw, sid, rid, w_ref[:], lanes)
        xout_ref[:] = xo
        eout_ref[:] = eo

    vs = lambda shape, imap: pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
    from functools import partial as _p
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunks, G),
        in_specs=[
            vs((1, 1, EMAX), lambda c, g, ws: (g, 0, 0)),
            vs((1, 1, EMAX), lambda c, g, ws: (g, 0, 0)),
            vs((128, lanes), lambda c, g, ws: (g, c)),
        ] + [
            vs((128, lanes), _p(lambda kk, c, g, ws: (ws[g, kk], c), kk))
            for kk in range(WB)
        ] + [
            vs((EMAX, lanes), lambda c, g, ws: (g, c)),
            vs((128, 128), lambda c, g, ws: (0, 0)),
        ],
        out_specs=[
            vs((128, lanes), lambda c, g, ws: (g, c)),
            vs((EMAX, lanes), lambda c, g, ws: (g, c)),
        ],
    )
    f = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((N, TOT), jnp.bfloat16),
                   jax.ShapeDtypeStruct((G * EMAX, TOT), jnp.bfloat16)],
    )
    sidx3 = sidx[:, None, :]
    ridx3 = ridx[:, None, :]
    return lambda x2, e2: f(win_start, sidx3, ridx3, x2, *([x2] * WB), e2, wk)


for lanes in (512,):
    try:
        timeit(make_auto(lanes), f"auto   lanes={lanes}")
    except Exception as ex:
        print(f"auto lanes={lanes} FAIL: {str(ex)[:200]}", flush=True)
    try:
        man = make_manual(lanes)
        timeit(lambda x2, e2: man(win_start, sidx, ridx, x2, e2, wk),
               f"manual lanes={lanes}")
    except Exception as ex:
        print(f"manual lanes={lanes} FAIL: {str(ex)[:300]}", flush=True)
