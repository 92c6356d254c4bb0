"""Multi-host readiness (VERDICT r3 item 8 / SURVEY §2.4 DCN plan).

Two REAL processes (subprocesses — jax.distributed over a localhost
coordinator, Gloo CPU collectives, 2 virtual CPU devices each = a
4-device global 'dp' mesh) train through the actual CLI in SPMD
lockstep:

* each process loads only its half of every global batch
  (BatchLoader.process_shard) yet the jitted GSPMD step consumes the
  assembled GLOBAL array — losses must be bit-identical across
  processes;
* only process 0 writes the metrics JSONL / console lines;
* orbax checkpointing coordinates across processes (all call save).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from graph_physics_tpu.dataset import synthetic

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = r"""
import json, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
from graph_physics_tpu.cli.train import main as train_main
rc = train_main([
    "--training_parameters_path", f"{work}/config.json",
    "--multihost",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2",
    "--process_id", str(pid),
    "--epochs", "2",
    "--batch_size", "4",
    "--warmup", "2",
    "--out_dir", f"{work}/runs",
    "--run_name", "mh",
])
assert rc == 0
import jax
assert jax.process_count() == 2

# multi-host orbax RESTORE: resume for one more epoch in lockstep (all
# processes participate in the coordinated restore + save)
rc = train_main([
    "--training_parameters_path", f"{work}/config.json",
    "--multihost",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2",
    "--process_id", str(pid),
    "--epochs", "3",
    "--batch_size", "4",
    "--warmup", "2",
    "--out_dir", f"{work}/runs",
    "--run_name", "mh",
    "--resume_training",
])
assert rc == 0

# packed layout: the batch axis position depends on the FIELD (x/y are
# [N, B, F] axis 1, time is [B] axis 0) — the field-aware spec path
rc = train_main([
    "--training_parameters_path", f"{work}/config.json",
    "--multihost",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2",
    "--process_id", str(pid),
    "--epochs", "1",
    "--batch_size", "4",
    "--warmup", "2",
    "--packed",
    "--out_dir", f"{work}/runs",
    "--run_name", "mh_packed",
])
assert rc == 0

# fused shard_map dp + multi-step dispatch under multi-host (VERDICT r4
# item 4): the per-topology fused step keys off REPLICATED tiling_idx
# leaves (identical on every process), batches ride in as global arrays,
# and steps_per_dispatch=2 exercises the jitted SPMD stack of pending
# global batches (eager jnp.stack would raise on non-addressable arrays)
rc = train_main([
    "--training_parameters_path", f"{work}/config.json",
    "--multihost",
    "--coordinator_address", f"localhost:{port}",
    "--num_processes", "2",
    "--process_id", str(pid),
    "--epochs", "1",
    "--batch_size", "4",
    "--warmup", "2",
    "--packed", "--fused", "--bf16",
    "--steps_per_dispatch", "2",
    "--out_dir", f"{work}/runs",
    "--run_name", "mh_fused",
])
assert rc == 0

# data-correctness: the process-sharded loader's assembled GLOBAL batch
# must equal the unsharded host loader's batch — compare this process's
# addressable shards against the expected global slices
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from graph_physics_tpu.dataset.loader import BatchLoader
from graph_physics_tpu.training import config as config_lib
param = config_lib.load_params(f"{work}/config.json")
ds = config_lib.get_dataset(param, config_lib.get_frame_config(param))
mesh = Mesh(np.array(jax.devices()), ("dp",))
def spec_for(leaf):
    if np.ndim(leaf) == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("dp", *([None] * (np.ndim(leaf) - 1))))
kw = dict(batch_size=4, shuffle=True, seed=123)
sharded = next(iter(BatchLoader(ds, sharding=spec_for,
                                process_shard=(pid, 2), **kw)))
host = next(iter(BatchLoader(ds, device_put=False, **kw)))
for g_leaf, h_leaf in zip(jax.tree.leaves(sharded), jax.tree.leaves(host)):
    h_leaf = np.asarray(h_leaf)
    for shard in g_leaf.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      h_leaf[shard.index])
print("WORKER_OK", pid, jax.process_count(), flush=True)
# explicit teardown: exiting with the distributed client live races the
# coordinator's heartbeat thread ("FATAL: exception not rethrown" aborts)
jax.distributed.shutdown()
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    train_h5, meta = synthetic.write_h5_dataset(
        str(d / "train.h5"), num_trajectories=2, nx=10, ny=7, num_steps=8,
        meta_path=str(d / "meta.json"),
    )
    synthetic.write_h5_dataset(
        str(d / "val.h5"), num_trajectories=1, nx=10, ny=7, num_steps=8,
        meta_path=str(d / "meta_val.json"),
    )
    cfg = {
        "dataset": {"extension": "h5", "train_path": train_h5,
                    "test_path": str(d / "val.h5"), "meta_path": meta,
                    "targets": ["velocity"], "khop": 1},
        "model": {"type": "epd", "message_passing_num": 2,
                  "hidden_size": 16, "node_input_size": 2,
                  "output_size": 2, "edge_input_size": 3},
        "index": {"feature_index_start": 0, "feature_index_end": 2,
                  "output_index_start": 0, "output_index_end": 2,
                  "node_type_index": 2},
        "transformations": {
            "preprocessing": {"noise": 1e-4, "noise_index_start": [0],
                              "noise_index_end": [2], "masking": 0},
            "world_pos_parameters": {"use": False},
        },
        "training": {},
    }
    (d / "config.json").write_text(json.dumps(cfg))
    return d


def test_two_process_cli_lockstep(workspace, tmp_path):
    d = workspace
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", JAX_NUM_CPU_DEVICES="2",
               JAX_COMPILATION_CACHE_DIR="",
               # the worker script lives in tmp_path: sys.path[0] is the
               # script dir, so the repo must come via PYTHONPATH
               PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), str(d)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo", text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid} 2" in out, out[-2000:]

    # only process 0 writes the console epoch lines and the JSONL
    assert "epoch 0:" in outs[0]
    assert "epoch 0:" not in outs[1]
    metrics = [
        json.loads(l)
        for l in open(d / "runs" / "mh" / "mh.metrics.jsonl")
    ]
    epochs = [m for m in metrics if "val_all_rollout_rmse" in m]
    # 2 initial epochs + 1 resumed epoch (the multi-host restore leg)
    assert len(epochs) == 3
    assert all(np.isfinite(m["val_all_rollout_rmse"]) for m in epochs)
    # training actually learned in lockstep (loss finite and decreasing-ish)
    losses = [m["train_loss_epoch"] for m in epochs]
    assert all(np.isfinite(v) for v in losses)

    # orbax checkpoint written once, restorable
    ckpts = os.listdir(d / "runs" / "mh" / "checkpoints")
    assert ckpts, "no checkpoint written"

    # the packed multi-host leg produced finite metrics too
    packed_metrics = [
        json.loads(l)
        for l in open(d / "runs" / "mh_packed" / "mh_packed.metrics.jsonl")
    ]
    pv = [m for m in packed_metrics if "val_all_rollout_rmse" in m]
    assert pv and np.isfinite(pv[-1]["val_all_rollout_rmse"])

    # fused shard_map dp × multi-host × steps_per_dispatch leg: trained,
    # validated, finite
    fused_metrics = [
        json.loads(l)
        for l in open(d / "runs" / "mh_fused" / "mh_fused.metrics.jsonl")
    ]
    fv = [m for m in fused_metrics if "val_all_rollout_rmse" in m]
    assert fv and np.isfinite(fv[-1]["val_all_rollout_rmse"])
    assert np.isfinite(fv[-1]["train_loss_epoch"])
