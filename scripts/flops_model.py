"""Issued-MXU-flop accounting for the fused train step (CSR vs NK).

Counts every ``dot_general`` in the traced train step — including the
ones INSIDE Pallas kernel bodies, multiplied by their grid size — and
converts the total to a step-time floor at the measured ~90 TF/s issued
ceiling (scripts/mxu_handicap.py; BASELINE.md roofline section). This is
the accounting behind the "N ms absolute floor" numbers: it prices the
one-hot gather/scatter contractions and the RMS-statistics dots at the
same issued rate as the MLP matmuls, because the MXU runs them all from
the same streamed-operand pattern.

Pure tracing — no TPU needed, no kernel execution. Run:

    JAX_PLATFORMS=cpu python scripts/flops_model.py [csr|nk|both]
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":  # importable from TPU processes without
    jax.config.update("jax_platforms", "cpu")  # hijacking their platform

MEASURED_TF_S = 90e12  # issued ceiling, scripts/mxu_handicap.py
BATCH = 128


def _dot_flops(eqn) -> float:
    (ldims, rdims), (lb, rb) = eqn.params["dimension_numbers"]
    a, b = (v.aval for v in eqn.invars[:2])
    k = float(np.prod([a.shape[d] for d in ldims])) if ldims else 1.0
    bt = float(np.prod([a.shape[d] for d in lb])) if lb else 1.0
    m = float(np.prod([s for d, s in enumerate(a.shape)
                       if d not in ldims and d not in lb]))
    n = float(np.prod([s for d, s in enumerate(b.shape)
                       if d not in rdims and d not in rb]))
    return 2.0 * bt * m * n * k


def _sub_jaxprs(eqn):
    """(jaxpr, multiplier) pairs nested under one equation."""
    out = []
    p = eqn.params
    name = eqn.primitive.name
    if name == "pallas_call":
        grid = p["grid_mapping"].grid
        mult = float(np.prod([int(g) for g in grid])) if grid else 1.0
        out.append((p["jaxpr"], mult))
        return out
    mult = float(p.get("length", 1)) if name == "scan" else 1.0
    for key in ("jaxpr", "call_jaxpr", "fun_jaxpr", "fwd_jaxpr_thunk"):
        j = p.get(key)
        if j is not None and not callable(j):
            out.append((j, mult))
    for br in p.get("branches", ()) or ():
        out.append((br, 1.0))  # upper bound: count every branch once
    return out


def _count(jaxpr, mult=1.0, bucket=None):
    if bucket is None:
        bucket = {}
    inner = getattr(jaxpr, "jaxpr", jaxpr)  # ClosedJaxpr -> Jaxpr
    if not hasattr(inner, "eqns"):  # WrappedFun thunks etc.
        return bucket
    for eqn in inner.eqns:
        if eqn.primitive.name == "dot_general":
            a, b = (v.aval for v in eqn.invars[:2])
            key = (tuple(a.shape), tuple(b.shape))
            fl = _dot_flops(eqn) * mult
            cnt, tot = bucket.get(key, (0.0, 0.0))
            bucket[key] = (cnt + mult, tot + fl)
        for sub, m in _sub_jaxprs(eqn):
            _count(sub, mult * m, bucket)
    return bucket


def trace_step(gn_nk: bool):
    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.training.step import init_train_state

    sim, opt, step_fn, batch = _cylinder_setup(
        nx=48, ny=40, hidden=32, mp_steps=5, batch=BATCH,
        packed=True, fused=True, gn_nk=gn_nk,
    )
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch)
    jaxpr = jax.make_jaxpr(step_fn)(state, batch, jax.random.PRNGKey(1))
    return _count(jaxpr)


TF_BATCH = 64  # scripts/bench_models.py transformer batch


def trace_transformer(variant: str):
    """variant: 'xla' | 'csr' | 'nk' — same shapes as bench_models.py
    (plate config: 10 blocks, hidden 64, 4 heads, B=64 packed)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.models.processors import EncodeTransformDecode
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.ops import tiling as tiling_lib
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack
    from graph_physics_tpu.training.step import (
        NoiseConfig, init_train_state, make_train_step,
    )

    traj = synthetic.make_trajectory(48, 40, num_steps=3)
    pos = traj["mesh_pos"][0]
    nt = traj["node_type"][0, :, 0]
    x = np.concatenate(
        [traj["velocity"][0], nt[:, None].astype(np.float32),
         np.zeros((len(pos), 1), np.float32)], -1)
    ei = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
    g = mesh_lib.build_mesh_graph(x, pos, nt, ei, y=traj["velocity"][1])

    kw = dict(message_passing_num=10, node_input_size=2 + 9, output_size=2,
              hidden_size=64, num_heads=4, dtype=jnp.bfloat16)
    if variant == "xla":
        model = EncodeTransformDecode(**kw)
    else:
        t = tiling_lib.build_edge_tiling(
            np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
            edge_mask=np.asarray(g.edge_mask))
        g = tiling_lib.apply_to_graph(g, t)
        if variant == "nk":
            from graph_physics_tpu.ops.fused_edge_attention_nk import (
                build_nk_tiling,
            )

            t_nk = build_nk_tiling(
                np.asarray(g.senders), np.asarray(g.receivers),
                int(g.n_node), edge_mask=np.asarray(g.edge_mask))
            assert t_nk is not None
            g = _dc.replace(g, tiling_idx=None)
            model = EncodeTransformDecode(
                edge_tiling=t, edge_tiling_nk=t_nk, **kw)
        else:
            model = EncodeTransformDecode(edge_tiling=t, **kw)

    sim = Simulator(
        node_input_size=2 + 9, edge_input_size=0, output_size=2,
        feature_index_start=0, feature_index_end=2,
        output_index_start=0, output_index_end=2, node_type_index=2,
        model=model)
    opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)
    noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))
    step = make_train_step(sim, opt, LossType.L2LOSS, noise, num_steps=10000)
    batch_graph = pack(jax.tree.map(
        lambda a: np.stack([np.asarray(a)] * TF_BATCH), g))
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch_graph)
    jaxpr = jax.make_jaxpr(step)(state, batch_graph, jax.random.PRNGKey(1))
    return _count(jaxpr)


def report(name: str, bucket, batch: int = BATCH) -> float:
    total = sum(t for _, t in bucket.values())
    print(f"\n=== {name}: dot_general inventory (whole train step) ===")
    rows = sorted(bucket.items(), key=lambda kv: -kv[1][1])
    for (sa, sb), (cnt, fl) in rows[:14]:
        print(f"  {str(sa):>22} @ {str(sb):<22} x{cnt:>8.0f}"
              f"  {fl / 1e12:7.3f} TF ({100 * fl / total:4.1f}%)")
    if len(rows) > 14:
        rest = sum(fl for _, (_, fl) in rows[14:])
        print(f"  ... {len(rows) - 14} more shapes        "
              f"  {rest / 1e12:7.3f} TF ({100 * rest / total:4.1f}%)")
    floor_ms = total / MEASURED_TF_S * 1e3
    gsps = batch / (floor_ms / 1e3)
    print(f"  TOTAL {total / 1e12:.3f} TF-issued -> floor "
          f"{floor_ms:.1f} ms/step at 90 TF/s "
          f"= {gsps:,.0f} graph-steps/s compute-bound")
    return total


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    totals = {}
    if which in ("csr", "both"):
        totals["csr"] = report("CSR (blocked one-hot)", trace_step(False))
    if which in ("nk", "both"):
        totals["nk"] = report("NK (uniform-degree)", trace_step(True))
    if len(totals) == 2:
        print(f"\nNK / CSR issued-flop ratio: "
              f"{totals['nk'] / totals['csr']:.3f}")
    if which in ("tf", "transformer"):
        tf = {}
        for v in ("xla", "csr", "nk"):
            tf[v] = report(f"transformer/{v}", trace_transformer(v),
                           batch=TF_BATCH)
        print(f"\ntransformer NK / CSR issued-flop ratio: "
              f"{tf['nk'] / tf['csr']:.3f}")


if __name__ == "__main__":
    main()
