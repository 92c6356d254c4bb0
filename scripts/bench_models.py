"""Per-family train-step throughput on the TPU (transformer/transolver
coverage beyond bench.py's headline EPD number). Prints one JSON line per
family; results recorded in BASELINE.md."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from graph_physics_tpu.core import mesh as mesh_lib
    from graph_physics_tpu.dataset import synthetic
    from graph_physics_tpu.models.processors import (
        EncodeTransformDecode,
        TransolverProcessor,
    )
    from graph_physics_tpu.models.simulator import Simulator
    from graph_physics_tpu.training import schedule
    from graph_physics_tpu.training.loss import LossType
    from graph_physics_tpu.training.packed import pack
    from graph_physics_tpu.training.step import (
        NoiseConfig,
        init_train_state,
        make_multi_step,
        make_train_step,
    )

    traj = synthetic.make_trajectory(48, 40, num_steps=3)
    pos = traj["mesh_pos"][0]
    nt = traj["node_type"][0, :, 0]
    x = np.concatenate(
        [traj["velocity"][0], nt[:, None].astype(np.float32),
         np.zeros((len(pos), 1), np.float32)], -1,
    )
    ei = mesh_lib.faces_to_edges(traj["cells"][0], len(pos))
    g = mesh_lib.build_mesh_graph(x, pos, nt, ei, y=traj["velocity"][1])

    #: committed per-family regression floors (BASELINE.md rounds 3-4);
    #: BM_ASSERT=1 turns misses into a hard failure
    FLOORS = {"epd": 4000.0, "transformer": 335.0,
              "transformer_fused": 1100.0, "transformer_nk": 1400.0,
              # re-based in round 4: the 5,500 floor predates the gumbel
              # parity fix (training now samples slice noise like the
              # reference — transolver.py:135); measured 5,030 with the
              # rbg gumbel key (threefry: 4,592; pre-gumbel: 7,227)
              "transolver": 4500.0}
    results = {}

    def bench(name, model, batch=64, inner=100, packed=True, graph=None):
        # BM_INNER: dispatch-length override (the multigrid leg's
        # 100-step scan body is large enough to fault the tunneled
        # worker; 20 keeps the per-dispatch overhead share <2%)
        inner = int(os.environ.get("BM_INNER", inner))
        sim = Simulator(
            node_input_size=2 + 9, edge_input_size=0, output_size=2,
            feature_index_start=0, feature_index_end=2,
            output_index_start=0, output_index_end=2, node_type_index=2,
            model=model,
        )
        opt = schedule.make_optimizer(1e-3, warmup=100, num_steps=10000)
        noise = NoiseConfig(starts=(0,), ends=(2,), scales=(0.02,))
        step = make_train_step(sim, opt, LossType.L2LOSS, noise, num_steps=10000)
        batch_graph = jax.tree.map(
            lambda a: np.stack([np.asarray(a)] * batch),
            g if graph is None else graph,
        )
        if packed:
            batch_graph = pack(batch_graph)
        # commit the batch on-device ONCE (same fix as bench.py): a numpy
        # batch re-ships ~tens of MB through the tunnel on every dispatch
        # — a pure measurement artifact vs the loader's overlapped H2D
        batch_graph = jax.device_put(batch_graph)
        state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch_graph)
        multi = make_multi_step(step, unroll=inner)
        rng = jax.random.PRNGKey(1)
        state, m = multi(state, batch_graph, rng)
        _ = float(np.asarray(m["loss"])[-1])
        best = float("inf")
        deadline = time.time() + 120
        while time.time() < deadline:
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, m = multi(state, batch_graph, k)
            _ = float(np.asarray(m["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
        val = inner * batch / best
        results[name] = val
        floor = FLOORS.get(name)
        print(json.dumps({
            "metric": f"{name}_graph_steps_per_sec_per_chip",
            "value": round(val, 2),
            "unit": "graphs/s",
            "floor": floor,
            "above_floor": None if floor is None else bool(val >= floor),
        }), flush=True)

    import sys as _sys

    only = _sys.argv[1] if len(_sys.argv) > 1 else None

    def want(name):
        return only is None or only in name

    if want("transformer_xla"):
        bench("transformer", EncodeTransformDecode(
            message_passing_num=10, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
        ))

    # fused Pallas edge attention over the blocked tiling
    from graph_physics_tpu.ops import tiling as tiling_lib

    t = tiling_lib.build_edge_tiling(
        np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
        edge_mask=np.asarray(g.edge_mask))
    g_tiled = tiling_lib.apply_to_graph(g, t)
    if not want("transformer_fused"):
        t = None
    if t is not None:
        import os as _os
        bt = int(_os.environ.get("BM_TF_BATCH", "64"))
        bench("transformer_fused", EncodeTransformDecode(
            message_passing_num=10, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, dtype=jnp.bfloat16, edge_tiling=t,
        ), graph=g_tiled, batch=bt)

    # uniform-degree (NK) attention variant (static-topology dispatch:
    # tiling_idx must be None or the Attention layer falls back to CSR)
    if want("transformer_nk"):
        import dataclasses as _dc

        from graph_physics_tpu.ops.fused_edge_attention_nk import (
            build_nk_tiling,
        )

        t_nk = build_nk_tiling(
            np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
            edge_mask=np.asarray(g.edge_mask))
        if t_nk is not None:
            t_csr = t if t is not None else tiling_lib.build_edge_tiling(
                np.asarray(g.senders), np.asarray(g.receivers),
                int(g.n_node), edge_mask=np.asarray(g.edge_mask))
            g_nk = _dc.replace(
                g_tiled if t is not None
                else tiling_lib.apply_to_graph(g, t_csr),
                tiling_idx=None,
            )
            bt = int(os.environ.get("BM_TF_BATCH", "64"))
            bench("transformer_nk", EncodeTransformDecode(
                message_passing_num=10, node_input_size=2 + 9, output_size=2,
                hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
                edge_tiling=t_csr, edge_tiling_nk=t_nk,
            ), graph=g_nk, batch=bt)
    # nb=64 NK variant: 0.75x window gather/scatter flops at 2x grid steps
    # (scripts/flops_model.py models floor 2,105 -> 2,426 g/s)
    if want("transformer_nk64"):
        import dataclasses as _dc

        from graph_physics_tpu.ops.fused_edge_attention_nk import (
            build_nk_tiling,
        )

        t_csr = t if t is not None else tiling_lib.build_edge_tiling(
            np.asarray(g.senders), np.asarray(g.receivers),
            int(g.n_node), edge_mask=np.asarray(g.edge_mask))
        t_nk64 = build_nk_tiling(
            np.asarray(g.senders), np.asarray(g.receivers), int(g.n_node),
            edge_mask=np.asarray(g.edge_mask), node_block=64)
        if t_nk64 is not None and t_nk64.num_nodes == t_csr.num_nodes:
            g_nk64 = _dc.replace(
                g_tiled if t is not None
                else tiling_lib.apply_to_graph(g, t_csr),
                tiling_idx=None,
            )
            bt = int(os.environ.get("BM_TF_BATCH", "64"))
            bench("transformer_nk64", EncodeTransformDecode(
                message_passing_num=10, node_input_size=2 + 9, output_size=2,
                hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
                edge_tiling=t_csr, edge_tiling_nk=t_nk64,
            ), graph=g_nk64, batch=bt)

    # Transolver consumes [B, N, F] stacked batches (its physics attention
    # adds its own batch dim; the packed [N, B, F] layout doesn't apply)
    if want("transolver") and "transolver_" not in (only or ""):
        bench("transolver", TransolverProcessor(
            message_passing_num=4, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, slice_num=32, dtype=jnp.bfloat16,
        ), batch=16, packed=False)

    # multigrid ETD (model.use_multigrid, reference README.md:430-462):
    # coarsen to ratio*N nodes after the encoder, run every transformer
    # block on the kNN remesh, knn-interpolate back. Per-sample top-k
    # selection => stacked [B, N, F] layout only (no packed/fused path).
    if want("transformer_mg"):
        bench("transformer_mg", EncodeTransformDecode(
            message_passing_num=10, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, dtype=jnp.bfloat16,
            use_multigrid=True,
        ), batch=16, packed=False)

    # gumbel clawback A/B (VERDICT r4 item 5): the training-time slice
    # noise drawn by the on-chip Pallas PRNG (ops/gumbel.py) instead of
    # the XLA rbg uniform + double-log pass
    if want("transolver_fgum"):
        bench("transolver_fgum", TransolverProcessor(
            message_passing_num=4, node_input_size=2 + 9, output_size=2,
            hidden_size=64, num_heads=4, slice_num=32, dtype=jnp.bfloat16,
            fused_gumbel=True,
        ), batch=16, packed=False)

    if os.environ.get("BM_ASSERT"):
        misses = {k: v for k, v in results.items()
                  if FLOORS.get(k) is not None and v < FLOORS[k]}
        assert not misses, f"per-family floors missed: {misses}"


if __name__ == "__main__":
    main()
