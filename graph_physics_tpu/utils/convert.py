"""Convert reference (DonsetPG/graph-physics) PyTorch checkpoints into this
framework's parameters and simulator state.

Migration seam for reference users: a checkpoint trained with the PyTorch
reference loads directly into this TPU framework, with every weight and
every normalizer statistic carried over, so rollouts/fine-tuning continue
bit-compatibly (up to dtype) from where the torch run left off.

Accepted checkpoint containers (auto-detected):

* the reference Simulator's own file — ``{"model": simulator.state_dict(),
  "_output_normalizer": ..., ...}`` (reference models/simulator.py:248-275);
* a PyTorch-Lightning ``.ckpt`` — ``{"state_dict": {"model.<...>": ...}}``
  where the Lightning module's ``self.model`` is the Simulator
  (reference training/lightning_module.py:84);
* a raw ``Simulator.state_dict()`` mapping.

Weight-layout contracts implemented here (and proven against the actual
reference code by ``tests/test_convert.py`` via the cross-framework parity
harness):

* torch ``nn.Linear`` stores ``weight [out, in]``; flax ``Dense`` stores
  ``kernel [in, out]`` — transposed on the way in.
* multi-head projections: the reference reshapes ``(N, head_dim, heads)``
  — heads LAST (reference models/layers.py:673-675, 840-851) — while this
  repo uses ``(N, heads, head_dim)``; q/k/v/gate kernels+biases are
  column-permuted and the output projection row-permuted so per-head
  computation matches exactly (see ``_head_perm``).
* Transolver projections are heads-FIRST in both frameworks — no
  permutation (reference models/transolver.py).
* Normalizer buffers ``_acc_sum [1, F]`` → ``NormalizerState.acc_sum [F]``
  etc. (reference models/layers.py:281-408).

Every source tensor must be consumed by the mapping; leftover keys raise
``ConversionError`` (listing them) instead of silently dropping weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from graph_physics_tpu.models.normalizer import NormalizerState, normalizer_init


class ConversionError(ValueError):
    """A reference checkpoint could not be mapped onto this framework."""


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


# ----------------------------------------------------------------------
# flat state-dict view with consumption tracking
# ----------------------------------------------------------------------


class _SD:
    """Flat ``{key: array}`` view; every ``take`` marks the key consumed so
    the top-level conversion can refuse checkpoints with unmapped tensors."""

    def __init__(self, flat: Dict[str, np.ndarray]):
        self.d = dict(flat)
        self.used: set = set()

    def has(self, key: str) -> bool:
        return key in self.d

    def take(self, key: str) -> np.ndarray:
        if key not in self.d:
            raise ConversionError(f"expected checkpoint key '{key}' not found")
        self.used.add(key)
        return _np(self.d[key])

    def linear_indices(self, prefix: str) -> List[int]:
        """torch ``nn.Sequential`` positions holding a Linear under prefix."""
        out = set()
        for k in self.d:
            if k.startswith(prefix + "."):
                rest = k[len(prefix) + 1 :].split(".")
                if len(rest) == 2 and rest[1] == "weight" and rest[0].isdigit():
                    out.add(int(rest[0]))
        return sorted(out)

    def unused(self) -> List[str]:
        return sorted(set(self.d) - self.used)


# ----------------------------------------------------------------------
# module mappers (torch state_dict names -> flax param subtrees)
# ----------------------------------------------------------------------


def _head_perm(hidden: int, heads: int) -> np.ndarray:
    """perm[c_ours] = reference channel for our channel c: ours flattens
    (head h, dim d) as c = h*dh + d; the reference reshape (N, dh, H) maps
    channel c_ref = d*H + h (reference models/layers.py:673-675)."""
    dh = hidden // heads
    c = np.arange(hidden)
    h, d = c // dh, c % dh
    return d * heads + h


def _dense(sd: _SD, p: str, col_perm=None, row_perm=None) -> Dict[str, jnp.ndarray]:
    kernel = sd.take(f"{p}.weight").T.copy()  # [in, out]
    out: Dict[str, np.ndarray] = {"kernel": kernel}
    if sd.has(f"{p}.bias"):
        out["bias"] = sd.take(f"{p}.bias").copy()
    if col_perm is not None:
        out["kernel"] = out["kernel"][:, col_perm]
        if "bias" in out:
            out["bias"] = out["bias"][col_perm]
    if row_perm is not None:
        out["kernel"] = out["kernel"][row_perm, :]
    return {k: jnp.asarray(v, jnp.float32) for k, v in out.items()}


def _rmsnorm(sd: _SD, p: str) -> Dict[str, jnp.ndarray]:
    out = {"scale": jnp.asarray(sd.take(f"{p}.scale"), jnp.float32)}
    if sd.has(f"{p}.offset"):
        out["offset"] = jnp.asarray(sd.take(f"{p}.offset"), jnp.float32)
    return out


def _layernorm(sd: _SD, p: str) -> Dict[str, jnp.ndarray]:
    """torch nn.LayerNorm (weight/bias) -> flax LayerNorm (scale/bias)."""
    return {
        "scale": jnp.asarray(sd.take(f"{p}.weight"), jnp.float32),
        "bias": jnp.asarray(sd.take(f"{p}.bias"), jnp.float32),
    }


def _mlp(sd: _SD, p: str) -> Dict[str, Any]:
    """reference build_mlp Sequential (layers.py:163-210) -> our MLP:
    Linear positions in order -> Dense_0..n; trailing RMSNorm -> RMSNorm_0."""
    params: Dict[str, Any] = {}
    for j, i in enumerate(sd.linear_indices(p)):
        params[f"Dense_{j}"] = _dense(sd, f"{p}.{i}")
    for k in list(sd.d):
        if k.startswith(p + ".") and k.endswith(".scale"):
            pos = k[len(p) + 1 : -len(".scale")]
            if pos.isdigit():
                params["RMSNorm_0"] = _rmsnorm(sd, f"{p}.{pos}")
    if not params:
        raise ConversionError(f"no Linear layers found under '{p}'")
    return params


def _gated_mlp(sd: _SD, p: str) -> Dict[str, Any]:
    """reference build_gated_mlp (RMSNorm, GatedMLP, Linear; layers.py:
    262-278) -> our GatedMLPBlock."""
    return {
        "RMSNorm_0": _rmsnorm(sd, f"{p}.0"),
        "GatedMLP_0": {
            "Dense_0": _dense(sd, f"{p}.1.linear1"),
            "Dense_1": _dense(sd, f"{p}.1.linear2"),
        },
        "Dense_0": _dense(sd, f"{p}.2"),
    }


def _graphnet_block(sd: _SD, p: str) -> Dict[str, Any]:
    """reference GraphNetBlock (layers.py:926-1102)."""
    gated = sd.has(f"{p}.edge_block.1.linear1.weight")
    sub = _gated_mlp if gated else _mlp
    params: Dict[str, Any] = {
        "edge_block": sub(sd, f"{p}.edge_block"),
        "node_block": sub(sd, f"{p}.node_block"),
    }
    if sd.has(f"{p}.gate_proj.weight"):
        params["gate_proj"] = _dense(sd, f"{p}.gate_proj")
        params["gate_pos"] = jnp.asarray(sd.take(f"{p}.gate_pos"), jnp.float32)
    if sd.has(f"{p}.rope_inv_freq"):  # non-persistent in the reference, but
        sd.take(f"{p}.rope_inv_freq")  # tolerate checkpoints that carry it
    return params


def _attention(sd: _SD, p: str, hidden: int, heads: int) -> Dict[str, Any]:
    """reference sparse Attention (layers.py:600-699)."""
    if not sd.has(f"{p}.k_proj.weight"):
        raise ConversionError(
            f"'{p}' has no separate k_proj — shared q/k/v projection "
            "(use_separate_proj_weight=False) checkpoints are not produced "
            "by any reference training config and are not supported"
        )
    perm = _head_perm(hidden, heads)
    params = {
        "q_proj": _dense(sd, f"{p}.q_proj", col_perm=perm),
        "k_proj": _dense(sd, f"{p}.k_proj", col_perm=perm),
        "v_proj": _dense(sd, f"{p}.v_proj", col_perm=perm),
        "proj": _dense(sd, f"{p}.proj", row_perm=perm),
    }
    if sd.has(f"{p}.gate_proj.weight"):
        params["gate_proj"] = _dense(sd, f"{p}.gate_proj", col_perm=perm)
    if sd.has(f"{p}.rope_inv_freq"):
        # persistent RoPE frequency buffer (reference layers.py:619,
        # registered when use_rope_embeddings=True) — deterministic from
        # config; our flax side recomputes it. Consume and discard.
        sd.take(f"{p}.rope_inv_freq")
    return params


def _transformer_block(sd: _SD, p: str, hidden: int, heads: int) -> Dict[str, Any]:
    """reference TransformerBlock (layers.py:700-819)."""
    return {
        "norm1": _rmsnorm(sd, f"{p}.norm1"),
        "norm2": _rmsnorm(sd, f"{p}.norm2"),
        "attention": _attention(sd, f"{p}.attention", hidden, heads),
        "gated_mlp": _gated_mlp(sd, f"{p}.gated_mlp"),
    }


def _temporal(sd: _SD, p: str, hidden: int, heads: int) -> Dict[str, Any]:
    """reference TemporalAttention (layers.py:822-887)."""
    perm = _head_perm(hidden, heads)
    params = {
        "q_proj": _dense(sd, f"{p}.q_proj", col_perm=perm),
        "k_proj": _dense(sd, f"{p}.k_proj", col_perm=perm),
        "v_proj": _dense(sd, f"{p}.v_proj", col_perm=perm),
        "out_proj": _dense(sd, f"{p}.out_proj", row_perm=perm),
        "mixer_0": _dense(sd, f"{p}.mixer.0"),
        "mixer_1": _dense(sd, f"{p}.mixer.2"),
    }
    if sd.has(f"{p}.gate.0.weight"):
        params["gate_0"] = _dense(sd, f"{p}.gate.0")
        params["gate_1"] = _dense(sd, f"{p}.gate.2")
    return params


# ----------------------------------------------------------------------
# Transolver++ (reference models/transolver.py; heads-first — no perms)
# ----------------------------------------------------------------------


def _transolver_attn(sd: _SD, p: str) -> Dict[str, Any]:
    params = {
        "in_project_x": _dense(sd, f"{p}.in_project_x"),
        "in_project_slice": _dense(sd, f"{p}.in_project_slice"),
        "proj_temperature_0": _dense(sd, f"{p}.proj_temperature.0"),
        "proj_temperature_1": _dense(sd, f"{p}.proj_temperature.2"),
        # reference bias is [1, H, 1, 1] (batched); ours is [1, H, 1]
        "bias": jnp.asarray(sd.take(f"{p}.bias")[..., 0], jnp.float32),
        "to_q": _dense(sd, f"{p}.to_q"),
        "to_k": _dense(sd, f"{p}.to_k"),
        "to_v": _dense(sd, f"{p}.to_v"),
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }
    if sd.has(f"{p}.rope_projection.weight"):
        params["rope_projection"] = _dense(sd, f"{p}.rope_projection")
    if sd.has(f"{p}.attn_gate.0.weight"):
        params["attn_gate_0"] = _dense(sd, f"{p}.attn_gate.0")
        params["attn_gate_1"] = _dense(sd, f"{p}.attn_gate.2")
    return params


def _transolver_block(sd: _SD, p: str) -> Dict[str, Any]:
    params = {
        "ln_1": _layernorm(sd, f"{p}.ln_1"),
        "ln_2": _layernorm(sd, f"{p}.ln_2"),
        "Attn": _transolver_attn(sd, f"{p}.Attn"),
        "mlp": _mlp(sd, f"{p}.mlp"),
    }
    if sd.has(f"{p}.ln_3.weight"):
        params["ln_3"] = _layernorm(sd, f"{p}.ln_3")
        params["mlp2"] = _dense(sd, f"{p}.mlp2")
    return params


def _transolver_model(sd: _SD, p: str, hidden: int, heads: int) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "preprocess": _mlp(sd, f"{p}.preprocess"),
        "placeholder": jnp.asarray(sd.take(f"{p}.placeholder"), jnp.float32),
    }
    if sd.has(f"{p}.embedding.weight"):
        # The reference Model unconditionally creates a condition-embedding
        # Linear (reference transolver.py:282) but the TransolverProcessor
        # wrapper hard-codes condition=None (transolver processor,
        # reference processors.py:453-459), so these weights are dead by
        # construction in every reference training config. Consume them
        # (strictness) but do not emit them: our flax tree only creates
        # the embedding when a condition is actually passed.
        _dense(sd, f"{p}.embedding")
    i = 0
    while sd.has(f"{p}.blocks.{i}.ln_1.weight"):
        params[f"blocks_{i}"] = _transolver_block(sd, f"{p}.blocks.{i}")
        i += 1
    if i == 0:
        raise ConversionError(f"no Transolver blocks found under '{p}.blocks'")
    if sd.has(f"{p}.temporal_block.q_proj.weight"):
        params["temporal_block"] = _temporal(sd, f"{p}.temporal_block", hidden, heads)
        params["output_proj"] = _dense(sd, f"{p}.output_proj")
    return params


# ----------------------------------------------------------------------
# container handling
# ----------------------------------------------------------------------


_NORM_STEMS = ("_output_normalizer.", "_node_normalizer.", "_edge_normalizer.")


def flatten_reference_checkpoint(ckpt: Any) -> Dict[str, np.ndarray]:
    """Unwrap any accepted container into the Simulator-level flat
    state_dict (keys ``model.<weights>`` + ``_*_normalizer.<buffers>``)."""
    if not isinstance(ckpt, dict):
        raise ConversionError(f"unsupported checkpoint object: {type(ckpt)}")
    if "state_dict" in ckpt and isinstance(ckpt["state_dict"], dict):
        ckpt = ckpt["state_dict"]  # Lightning container
    if "model" in ckpt and isinstance(ckpt["model"], dict):
        inner = ckpt["model"]
        # Simulator.save_checkpoint container: "model" holds the FULL
        # simulator state_dict (simulator.py:260-275); the sibling
        # get_variable() dicts are redundant copies of the same buffers.
        if any(k.startswith(_NORM_STEMS) for k in inner):
            ckpt = inner
    flat = {k: v for k, v in ckpt.items() if hasattr(v, "shape") or np.isscalar(v)}
    if not any(k.startswith(_NORM_STEMS) for k in flat):
        # Lightning state_dict: the module's self.model is the Simulator
        stripped = {
            k[len("model.") :]: v for k, v in flat.items() if k.startswith("model.")
        }
        if any(k.startswith(_NORM_STEMS) for k in stripped):
            outside = [k for k in flat if not k.startswith("model.")]
            if outside:
                import logging

                logging.getLogger(__name__).warning(
                    "ignoring %d Lightning-module tensors outside the "
                    "Simulator (e.g. MTP/aux heads): %s",
                    len(outside), outside[:8],
                )
            flat = stripped
    if not any(k.startswith(_NORM_STEMS) for k in flat):
        raise ConversionError(
            "could not locate Simulator normalizer buffers in the checkpoint "
            "(expected keys like '_output_normalizer._acc_sum'); supported "
            "containers: Simulator.save_checkpoint files, Lightning .ckpt, "
            "raw Simulator.state_dict()"
        )
    return flat


def _normalizer_state(sd: _SD, p: str, size: int) -> NormalizerState:
    state = normalizer_init(size)
    if not sd.has(f"{p}._acc_sum"):
        return state  # freshly-initialized reference normalizer
    acc_sum = sd.take(f"{p}._acc_sum").reshape(-1).astype(np.float32)
    acc_sq = sd.take(f"{p}._acc_sum_squared").reshape(-1).astype(np.float32)
    if acc_sum.shape[0] != size:
        raise ConversionError(
            f"normalizer '{p}' has size {acc_sum.shape[0]}, expected {size} "
            "— does the training config match the checkpoint?"
        )
    return dataclasses.replace(
        state,
        acc_sum=jnp.asarray(acc_sum),
        acc_sum_sq=jnp.asarray(acc_sq),
        acc_count=jnp.asarray(sd.take(f"{p}._acc_count"), jnp.float32).reshape(()),
        num_accumulations=jnp.asarray(
            sd.take(f"{p}._num_accumulations"), jnp.float32
        ).reshape(()),
    )


# ----------------------------------------------------------------------
# top level
# ----------------------------------------------------------------------


def convert_state_dict(
    flat: Dict[str, np.ndarray], param: Dict[str, Any]
) -> Tuple[Dict[str, Any], "SimulatorState"]:
    """Map a Simulator-level flat state_dict to (flax params, SimulatorState).

    ``param`` is the parsed training-parameters JSON (the same two-JSON
    contract the train/predict CLIs consume); it decides the model family
    and head counts. Raises ConversionError on any unmapped tensor.
    """
    from graph_physics_tpu.models.simulator import SimulatorState
    from graph_physics_tpu.core.nodetype import NodeType

    sd = _SD(flat)
    m = param["model"]
    model_type = m.get("type", "")
    hidden = m["hidden_size"]
    heads = m.get("num_heads", 4)

    if model_type == "epd":
        tree: Dict[str, Any] = {
            "nodes_encoder": _mlp(sd, "model.nodes_encoder"),
            "edges_encoder": _mlp(sd, "model.edges_encoder"),
            "decode_module": _mlp(sd, "model.decode_module"),
        }
        i = 0
        while sd.has(f"model.processor_list.{i}.node_block.0.weight") or sd.has(
            f"model.processor_list.{i}.node_block.1.linear1.weight"
        ):
            tree[f"block_{i}"] = _graphnet_block(sd, f"model.processor_list.{i}")
            i += 1
        if sd.has("model.temporal_block.q_proj.weight"):
            # EPD builds TemporalAttention with default heads=4 on both
            # sides (reference processors.py:123)
            tree["temporal_block"] = _temporal(sd, "model.temporal_block", hidden, 4)
    elif model_type == "transformer":
        tree = {
            "nodes_encoder": _mlp(sd, "model.nodes_encoder"),
            "decode_module": _mlp(sd, "model.decode_module"),
        }
        i = 0
        while sd.has(f"model.processor_list.{i}.norm1.scale"):
            tree[f"block_{i}"] = _transformer_block(
                sd, f"model.processor_list.{i}", hidden, heads
            )
            i += 1
        if sd.has("model.temporal_block.q_proj.weight"):
            tree["temporal_block"] = _temporal(
                sd, "model.temporal_block", hidden, heads
            )
        if sd.has("model.down_sampler.lin.weight"):
            # multigrid pooling (reference README.md:430-462 manual
            # wiring; config-wired here as model.use_multigrid). PyG
            # SelectTopK stores its learned projection as [1, d_in];
            # ours is [d_in, 1] (same score: x @ w).
            tree["down_sampler"] = {
                "select_weight": jnp.asarray(
                    sd.take("model.down_sampler.select.weight").reshape(-1, 1)
                ),
                "lin": _dense(sd, "model.down_sampler.lin"),
            }
            tree["up_sampler"] = {
                "lin": _dense(sd, "model.up_sampler.lin"),
            }
    elif model_type == "transolver":
        # both frameworks nest the Transolver under an inner 'model'
        tree = {"model": _transolver_model(sd, "model.model", hidden, heads)}
    else:
        raise ConversionError(f"model type '{model_type}' not supported")

    node_in = m["node_input_size"] + int(NodeType.SIZE)
    edge_in = m.get("edge_input_size")
    sim_state = SimulatorState(
        output_norm=_normalizer_state(sd, "_output_normalizer", m["output_size"]),
        node_norm=_normalizer_state(sd, "_node_normalizer", node_in),
        edge_norm=(
            _normalizer_state(sd, "_edge_normalizer", edge_in)
            if edge_in and sd.has("_edge_normalizer._acc_sum")
            else (normalizer_init(edge_in) if edge_in else None)
        ),
    )

    leftover = sd.unused()
    if leftover:
        raise ConversionError(
            "unmapped checkpoint tensors (conversion refuses to drop "
            f"weights silently): {leftover}"
        )
    return {"params": tree}, sim_state


def convert_torch_checkpoint(
    path: str, param: Dict[str, Any]
) -> Tuple[Dict[str, Any], "SimulatorState"]:
    """Load a reference torch checkpoint file and convert it.

    Requires torch (CPU is fine) to deserialize; the result is pure
    jax/numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    flat = flatten_reference_checkpoint(ckpt)
    flat = {k: _np(v) for k, v in flat.items()}
    return convert_state_dict(flat, param)
