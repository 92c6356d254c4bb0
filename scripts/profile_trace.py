"""Capture an XLA trace of the fused train step and print the op-level
time breakdown (parsed from the profiler's trace.json.gz)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from __graft_entry__ import _cylinder_setup
from graph_physics_tpu.training.step import init_train_state, make_multi_step

B = int(os.environ.get("BENCH_B", "128"))
sim, opt, step_fn, g = _cylinder_setup(
    nx=48, ny=40, hidden=32, mp_steps=5, batch=B, packed=True, fused=True,
    gn_nk=bool(int(os.environ.get("BENCH_GN_NK", "1"))))
state = init_train_state(sim, opt, jax.random.PRNGKey(0), g)
multi = make_multi_step(step_fn, unroll=10)
rng = jax.random.PRNGKey(1)

state, metrics = multi(state, g, rng)
_ = float(np.asarray(metrics["loss"])[-1])

os.system("rm -rf /tmp/fused_trace")
with jax.profiler.trace("/tmp/fused_trace"):
    state, metrics = multi(state, g, rng)
    _ = float(np.asarray(metrics["loss"])[-1])

path = sorted(glob.glob("/tmp/fused_trace/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

events = [e for e in trace["traceEvents"]
          if e.get("ph") == "X" and "dur" in e]
# keep only TPU-side op events (pid with 'TPU' in process name)
pid_names = {e["pid"]: e["args"].get("name", "")
             for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n}
tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
             for e in trace["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "thread_name"}

by_name = defaultdict(float)
by_cat = defaultdict(float)
total = 0.0
for e in events:
    if e["pid"] not in tpu_pids:
        continue
    tname = tid_names.get((e["pid"], e["tid"]), "")
    if "step" in tname.lower() or "XLA Op" in tname or "Ops" in tname:
        pass
    name = e["name"]
    dur = e["dur"]  # microseconds
    by_name[(tname, name)] += dur

print("== threads ==")
tdur = defaultdict(float)
for (t, n), d in by_name.items():
    tdur[t] += d
for t, d in sorted(tdur.items(), key=lambda kv: -kv[1]):
    print(f"{t:40s} {d/1e3:9.2f} ms")

print("\n== top ops (per thread with most time) ==")
main_t = max(tdur, key=tdur.get)
ops = defaultdict(float)
cnt = defaultdict(int)
for (t, n), d in by_name.items():
    if t == main_t:
        ops[n] += d
for e in events:
    if e["pid"] in tpu_pids and tid_names.get((e["pid"], e["tid"])) == main_t:
        cnt[e["name"]] += 1
for n, d in sorted(ops.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{d/1e3:9.2f} ms  x{cnt[n]:5d}  {n[:100]}")
