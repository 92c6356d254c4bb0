"""Benchmark: jitted train-step throughput on CylinderFlow-sized graphs.

Metric: graph-steps/sec/chip on the headline workload shape (cylinder:
~1.9k nodes, ~11k directed edges, EPD hidden 32, 5 MP steps, bf16 compute).
Baseline target (BASELINE.md): >= 5000 graph-steps/sec/chip on TPU v5e.
Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

#: headline workload shape — shared with scripts/prewarm_bench.py so the
#: persistent-cache prewarm always compiles exactly these programs
SETUP_KWARGS = dict(nx=48, ny=40, hidden=32, mp_steps=5, packed=True,
                    fused=True)
INNER_SIZES = (200, 20)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )

    from __graft_entry__ import _cylinder_setup
    from graph_physics_tpu.training.step import init_train_state, make_multi_step

    # trajectory-major packed batching + fused Pallas GraphNetBlocks on
    # the uniform-degree (NK) layout — the measured round-4 winner
    # (4,982 vs 4,778 g/s CSR same-window A/B with the device-resident
    # batch; 5,027 after the folded-backward lane-cap/r=2 default).
    # BENCH_GN_NK=0 flips back to the blocked-CSR kernel for A/B runs;
    # BENCH_B overrides the batch (sweeps: 128 optimal for CSR [r2] and
    # for NK [r4: 128 > 160 > 192 > 256 > 96]).
    batch = int(os.environ.get("BENCH_B", "128"))
    inner = INNER_SIZES[0]
    sim, opt, step_fn, batch_graph = _cylinder_setup(
        batch=batch, gn_nk=bool(int(os.environ.get("BENCH_GN_NK", "1"))),
        **SETUP_KWARGS,
    )
    # commit the batch to the device ONCE: the metric is on-device step
    # throughput; leaving numpy leaves here re-ships ~20 MB through the
    # tunnel every dispatch (~250 ms/dispatch measured — 1.2 ms/step of
    # pure transfer artifact at inner=200). Real training overlaps H2D
    # via the loader prefetch thread.
    batch_graph = jax.device_put(batch_graph)
    state = init_train_state(sim, opt, jax.random.PRNGKey(0), batch_graph)
    rng = jax.random.PRNGKey(1)

    # multi-step: `inner` optimizer steps fused into one XLA program —
    # one host dispatch per `inner` steps (amortizes link latency).
    multi = make_multi_step(step_fn, unroll=inner)

    # warmup / compile (force a real host fetch — block_until_ready alone
    # is unreliable over the axon tunnel)
    t0 = time.perf_counter()
    state, metrics = multi(state, batch_graph, rng)
    _ = float(np.asarray(metrics["loss"])[-1])
    warmup_s = time.perf_counter() - t0

    # The tunneled TPU is time-shared: identical programs run 3ms-1.4s
    # depending on contention. Take the best over a bounded window.
    # Under HEAVY contention (observed: a 200-step dispatch taking
    # minutes) the big dispatch can't even finish inside the window —
    # fall back to small dispatches so short quiet slices of the shared
    # chip still yield a valid best-window throughput sample.
    times = []
    compile_inclusive = 0  # sentinel samples kept only to avoid empty output
    if warmup_s > 45.0:
        # slow warmup can be a cold compile cache, not contention: probe
        # with one timed big dispatch (compiled now) before downshifting
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = multi(state, batch_graph, k)
        _ = float(np.asarray(metrics["loss"])[-1])
        probe_s = time.perf_counter() - t0
        if probe_s > 45.0:
            inner = INNER_SIZES[1]
            multi = make_multi_step(step_fn, unroll=inner)
            t0 = time.perf_counter()
            state, metrics = multi(state, batch_graph, rng)  # compile small
            _ = float(np.asarray(metrics["loss"])[-1])
            small_s = time.perf_counter() - t0
        else:
            # quiet again: the probe is a fair compiled big-dispatch sample
            times.append(probe_s)
    # the sampling window starts AFTER warmup/probe/downshift so a slow
    # probe doesn't silently consume it (ADVICE r3)
    deadline = time.time() + (240 if inner == INNER_SIZES[1] else 150)

    while len(times) < 20 and time.time() < deadline:
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = multi(state, batch_graph, k)
        _ = float(np.asarray(metrics["loss"])[-1])
        times.append(time.perf_counter() - t0)

    if not times:
        # every timed dispatch stalled past the window: report the
        # compile-inclusive downshift run rather than nothing, flagged
        times.append(small_s)
        compile_inclusive = 1

    best = min(times)
    # HEADLINE = p25 over the window (round-3 verdict): robust to the
    # time-shared tunnel's contention spikes without letting one lucky
    # trial set the committed number; the min rides along as best.
    p25 = float(np.percentile(times, 25))
    graph_steps_per_sec = inner * batch / p25
    baseline = 5000.0
    print(
        json.dumps(
            {
                "metric": "train_graph_steps_per_sec_per_chip",
                "value": round(graph_steps_per_sec, 2),
                "unit": "graphs/s",
                "vs_baseline": round(graph_steps_per_sec / baseline, 3),
                "best_graphs_per_sec": round(inner * batch / best, 2),
                "trials": len(times),
                "inner": inner,
                "warmup_s": round(warmup_s, 1),
                **(
                    {"compile_inclusive_sample": 1}
                    if compile_inclusive
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
