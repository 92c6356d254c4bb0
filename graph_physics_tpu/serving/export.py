"""Serving export: ahead-of-time compiled, self-contained model artifacts.

Packages a trained simulator as serialized ``jax.export`` StableHLO
artifacts — a single-frame **eval step** and a full-trajectory **rollout**
— that load and execute WITHOUT the model code, the config contract, or
the checkpoint machinery. This is the deployment seam the reference lacks
(its inference path re-instantiates the Lightning module + Simulator from
source, reference predict.py / training/lightning_module.py:370-420): a
serving host needs only jax + the artifact directory.

TPU-first: artifacts are multi-platform lowered (default ``cpu`` and
``tpu``), so the same file serves on a TPU host and on a CPU fallback.
The eval/rollout path is pure XLA by design (the Pallas kernels are a
train-time, packed-batch optimization), so cross-platform lowering is
exact.

Boundary convention: ``MeshGraph`` / ``SimulatorState`` are this repo's
custom pytrees, which ``jax.export`` cannot serialize as call signatures.
The exported functions therefore take plain ``dict`` trees
(``graph_to_dict`` / ``state_to_dict``); ``load_exported`` re-wraps them
so callers can keep passing the native types.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.models.normalizer import NormalizerState
from graph_physics_tpu.models.simulator import Simulator, SimulatorState

EVAL_FILE = "eval_step.jaxexport"
EVAL_BATCHED_FILE = "eval_step_batched.jaxexport"
ROLLOUT_FILE = "rollout.jaxexport"
MANIFEST_FILE = "manifest.json"

DEFAULT_PLATFORMS: Tuple[str, ...] = ("cpu", "tpu")


# ----------------------------------------------------------------------
# pytree <-> dict boundary
# ----------------------------------------------------------------------


#: MeshGraph fields that only exist for supervision/loss/bookkeeping —
#: stripped from the single-frame eval artifact's signature so a serving
#: host never has to fabricate ground-truth arrays (Simulator.prepare
#: handles their absence). The rollout artifact keeps them: it genuinely
#: consumes y (RMSE, BC write-back).
SUPERVISION_FIELDS = ("y", "next_data", "deselected", "traj_index")


def graph_to_dict(
    graph: MeshGraph, drop: Tuple[str, ...] = ()
) -> Dict[str, jnp.ndarray]:
    """Array fields of a MeshGraph as a plain dict (None fields dropped)."""
    out = {}
    for f in dataclasses.fields(graph):
        v = getattr(graph, f.name)
        if v is None or f.name in drop:
            continue
        if isinstance(v, tuple):  # tiling_idx — train-path only
            continue
        out[f.name] = v
    return out


def dict_to_graph(d: Dict[str, jnp.ndarray]) -> MeshGraph:
    return MeshGraph(**d)


def state_to_dict(state: SimulatorState) -> Dict[str, Any]:
    def norm(n: Optional[NormalizerState]):
        if n is None:
            return None
        return {
            "acc_sum": n.acc_sum,
            "acc_sum_sq": n.acc_sum_sq,
            "acc_count": n.acc_count,
            "num_accumulations": n.num_accumulations,
        }

    out = {"output_norm": norm(state.output_norm),
           "node_norm": norm(state.node_norm)}
    if state.edge_norm is not None:
        out["edge_norm"] = norm(state.edge_norm)
    return out


def dict_to_state(d: Dict[str, Any]) -> SimulatorState:
    def norm(nd):
        if nd is None:
            return None
        return NormalizerState(**nd)

    return SimulatorState(
        output_norm=norm(d["output_norm"]),
        node_norm=norm(d["node_norm"]),
        edge_norm=norm(d.get("edge_norm")),
    )


# ----------------------------------------------------------------------
# export
# ----------------------------------------------------------------------


def _specs(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), tree
    )


def make_eval_fn(simulator: Simulator, frame_transform=None):
    """``(params, state_dict, graph_dict) -> outputs [N, out]`` — the
    physical-space single-frame prediction (simulator eval contract,
    reference models/simulator.py:178-191). ``frame_transform`` is the
    same per-frame eval transform the rollout applies (e.g. world-pos
    edge features) so both artifacts compute the same function."""

    def eval_fn(params, state_dict, graph_dict):
        g = dict_to_graph(graph_dict)
        if frame_transform is not None:
            g = frame_transform(g)
        out = simulator.forward(
            params, dict_to_state(state_dict), g, is_training=False
        )
        return out.outputs

    return eval_fn


def make_rollout_export_fn(simulator: Simulator, **rollout_kwargs):
    """``(params, state_dict, frames_dict) -> result dict`` — autoregressive
    trajectory rollout ([T, ...] stacked frames) with BC masking."""
    from graph_physics_tpu.training.rollout import make_rollout_fn

    rollout = make_rollout_fn(simulator, **rollout_kwargs)

    def rollout_fn(params, state_dict, frames_dict):
        res = rollout(params, dict_to_state(state_dict),
                      dict_to_graph(frames_dict))
        return {
            "predictions": res.predictions,
            "rmse_all_rollout": res.rmse_all_rollout,
            "rmse_1step": res.rmse_1step,
            "val_loss": res.val_loss,
        }

    return rollout_fn


def export_eval_step(
    simulator: Simulator,
    params,
    sim_state: SimulatorState,
    example_graph: MeshGraph,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    batch_size: Optional[int] = None,
    frame_transform=None,
    dp_mesh: Optional[jax.sharding.Mesh] = None,
) -> jax_export.Exported:
    """``batch_size=None`` exports the single-graph step; an int exports a
    vmapped step taking ``[B, ...]``-leading graph leaves (same padding
    bucket) — the batched-inference shape for production serving.

    ``dp_mesh`` (requires ``batch_size`` divisible by the mesh size)
    additionally shards the batch axis over the mesh's first axis with
    replicated weights — ONE artifact runs data-parallel across the
    serving host's chips (jax.export serializes the shardings; the
    loading host calls it under a same-sized mesh)."""
    fn = make_eval_fn(simulator, frame_transform=frame_transform)
    graph_specs = _specs(graph_to_dict(example_graph, drop=SUPERVISION_FIELDS))
    if batch_size is not None:
        fn = jax.vmap(fn, in_axes=(None, None, 0))
        graph_specs = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct((batch_size,) + s.shape, s.dtype),
            graph_specs,
        )
    if dp_mesh is None:
        jit_fn = jax.jit(fn)
    else:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        if batch_size is None or batch_size % dp_mesh.size != 0:
            raise ValueError(
                f"dp_mesh needs batch_size divisible by mesh size "
                f"({batch_size} vs {dp_mesh.size})"
            )
        axis = dp_mesh.axis_names[0]
        rep = NamedSharding(dp_mesh, P())
        shard_b = NamedSharding(dp_mesh, P(axis))
        jit_fn = jax.jit(
            fn,
            in_shardings=(rep, rep, jax.tree.map(lambda _: shard_b,
                                                 graph_specs)),
            out_shardings=shard_b,
        )
    return jax_export.export(jit_fn, platforms=tuple(platforms))(
        _specs(params), _specs(state_to_dict(sim_state)), graph_specs
    )


def export_rollout(
    simulator: Simulator,
    params,
    sim_state: SimulatorState,
    example_frames: MeshGraph,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    symbolic_time: bool = False,
    **rollout_kwargs,
) -> jax_export.Exported:
    """With ``symbolic_time=True`` the trajectory length is exported as a
    symbolic dimension — ONE artifact rolls out trajectories of any length
    (node/edge padding buckets stay static, matching the training
    contract)."""
    fn = make_rollout_export_fn(simulator, **rollout_kwargs)
    fd = graph_to_dict(example_frames)
    if symbolic_time:
        t_dim = jax_export.symbolic_shape("T")[0]
        frames_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                (t_dim,) + jnp.shape(a)[1:], jnp.asarray(a).dtype
            ),
            fd,
        )
    else:
        frames_specs = _specs(fd)
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        _specs(params), _specs(state_to_dict(sim_state)), frames_specs
    )


def save_exported(
    out_dir: str,
    eval_step: Optional[jax_export.Exported] = None,
    rollout: Optional[jax_export.Exported] = None,
    batched_eval_step: Optional[jax_export.Exported] = None,
    extra_manifest: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Serialize artifacts + a human-readable manifest; returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    manifest: Dict[str, Any] = {
        "format": "jax.export serialized StableHLO",
        "jax_version": jax.__version__,
        "artifacts": {},
    }

    def describe(ex: jax_export.Exported):
        return {
            "platforms": list(ex.platforms),
            "in_avals": [str(a) for a in jax.tree.leaves(ex.in_avals)],
            "out_avals": [str(a) for a in jax.tree.leaves(ex.out_avals)],
        }

    if eval_step is not None:
        with open(os.path.join(out_dir, EVAL_FILE), "wb") as f:
            f.write(eval_step.serialize())
        manifest["artifacts"]["eval_step"] = describe(eval_step)
    if batched_eval_step is not None:
        with open(os.path.join(out_dir, EVAL_BATCHED_FILE), "wb") as f:
            f.write(batched_eval_step.serialize())
        manifest["artifacts"]["eval_step_batched"] = describe(batched_eval_step)
    if rollout is not None:
        with open(os.path.join(out_dir, ROLLOUT_FILE), "wb") as f:
            f.write(rollout.serialize())
        manifest["artifacts"]["rollout"] = describe(rollout)
    if extra_manifest:
        manifest.update(extra_manifest)
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class LoadedServingModel:
    """Deserialized serving artifacts; call with native or dict pytrees.

    ``eval_step(params, sim_state, graph) -> outputs [N, out]``
    ``rollout(params, sim_state, frames) -> dict`` (predictions, RMSEs)

    Calls run through ``Exported.call`` — they jit-compile for whatever
    platform the surrounding jax is on (must be one of the artifact's
    lowered platforms).
    """

    def __init__(self, out_dir: str):
        self.dir = out_dir
        with open(os.path.join(out_dir, MANIFEST_FILE)) as f:
            self.manifest = json.load(f)
        self._eval = self._load(EVAL_FILE)
        self._eval_batched = self._load(EVAL_BATCHED_FILE)
        self._rollout = self._load(ROLLOUT_FILE)
        self._batched_call = None  # dp-sharded jit wrapper, built once

    def _load(self, name: str) -> Optional[jax_export.Exported]:
        path = os.path.join(self.dir, name)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return jax_export.deserialize(f.read())

    @staticmethod
    def _graph_fields(exported: jax_export.Exported) -> set:
        """Graph-dict keys in the artifact's call signature (from in_tree:
        args pytree is ((params, state_dict, graph_dict), kwargs))."""
        args, _kwargs = jax.tree.unflatten(
            exported.in_tree, [0] * exported.in_tree.num_leaves
        )
        return set(args[2].keys())

    @staticmethod
    def _as_dicts(exported, sim_state, graph):
        if isinstance(sim_state, SimulatorState):
            sim_state = state_to_dict(sim_state)
        if isinstance(graph, MeshGraph):
            graph = graph_to_dict(graph)
        # filter to the artifact's signature (e.g. the eval artifact
        # strips SUPERVISION_FIELDS — a caller's val-style graph with y
        # populated must still be accepted)
        fields = LoadedServingModel._graph_fields(exported)
        missing = fields - set(graph)
        if missing:
            raise ValueError(
                f"graph is missing fields the artifact requires: {sorted(missing)}"
            )
        return sim_state, {k: graph[k] for k in fields}

    def eval_step(self, params, sim_state, graph):
        if self._eval is None:
            raise FileNotFoundError(f"no {EVAL_FILE} in {self.dir}")
        sim_state, graph = self._as_dicts(self._eval, sim_state, graph)
        return self._eval.call(params, sim_state, graph)

    def eval_step_batched(self, params, sim_state, graphs):
        """``graphs``: MeshGraph (or dict) with [B, ...]-leading leaves,
        B = the batch size fixed at export.

        dp-sharded artifacts (exported with ``dp_mesh``) are dispatched
        under a same-sized mesh over this host's devices automatically."""
        if self._eval_batched is None:
            raise FileNotFoundError(f"no {EVAL_BATCHED_FILE} in {self.dir}")
        ex = self._eval_batched
        sim_state, graphs = self._as_dicts(ex, sim_state, graphs)
        if ex.nr_devices <= 1:
            return ex.call(params, sim_state, graphs)
        if self._batched_call is None:
            # build the sharded jit wrapper ONCE — this is the serving hot
            # path; a per-request jit wrapper would retrace+recompile the
            # whole module on every request
            import numpy as _np
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            devs = jax.devices()
            if len(devs) < ex.nr_devices:
                raise ValueError(
                    f"artifact was exported for {ex.nr_devices} devices; "
                    f"this host has {len(devs)}"
                )
            mesh = Mesh(_np.array(devs[: ex.nr_devices]), ("dp",))
            rep = NamedSharding(mesh, P())
            shard_b = NamedSharding(mesh, P("dp"))
            self._batched_call = jax.jit(
                ex.call,
                in_shardings=(
                    rep, rep, jax.tree.map(lambda _: shard_b, graphs)
                ),
                out_shardings=shard_b,
            )
        return self._batched_call(params, sim_state, graphs)

    def rollout(self, params, sim_state, frames):
        if self._rollout is None:
            raise FileNotFoundError(f"no {ROLLOUT_FILE} in {self.dir}")
        sim_state, frames = self._as_dicts(self._rollout, sim_state, frames)
        return self._rollout.call(params, sim_state, frames)


def load_exported(out_dir: str) -> LoadedServingModel:
    return LoadedServingModel(out_dir)
