"""Maskable data + physics losses (jit-safe re-design of utils/loss.py).

Every loss is a pure function over a :class:`LossInputs` bundle. Masking
semantics match the reference (_prepare_mask_for_loss, loss.py:19-34):

  * include only nodes whose type is in ``mask_types`` (default
    {NORMAL, OUTFLOW}: lightning_module.py:48);
  * exclude explicitly deselected nodes (node-masking augmentation);
  * additionally (TPU-only) exclude padding rows via ``node_mask``.

``mean over errors[mask]`` in torch averages over the masked *elements*
(rows x feature columns); reproduced with a weighted sum / (rows*cols).

MultiLoss precomputes the two physical gradients once and reuses them
across terms (loss.py:429-482).
"""

from __future__ import annotations

import enum
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from graph_physics_tpu.core.graph import MeshGraph
from graph_physics_tpu.core.nodetype import NodeType
from graph_physics_tpu.ops import voperators

DEFAULT_MASK_TYPES: Tuple[int, ...] = (int(NodeType.NORMAL), int(NodeType.OUTFLOW))


@struct.dataclass
class LossInputs:
    graph: MeshGraph
    target: Optional[jnp.ndarray] = None  # normalized Δ target [N, F]
    network_output: Optional[jnp.ndarray] = None  # normalized prediction [N, F]
    network_output_physical: Optional[jnp.ndarray] = None
    target_physical: Optional[jnp.ndarray] = None
    network_output_gradient: Optional[jnp.ndarray] = None  # [N, F, D]
    target_gradient: Optional[jnp.ndarray] = None
    deselected: Optional[jnp.ndarray] = None  # [N] bool, True = excluded


def node_loss_mask(
    graph: MeshGraph,
    mask_types: Sequence[int] = DEFAULT_MASK_TYPES,
    deselected: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """[N] bool — nodes included in the loss."""
    t = graph.node_type
    m = jnp.zeros_like(t, dtype=bool)
    for mt in mask_types:
        m = m | (t == mt)
    m = m & graph.node_mask
    if deselected is not None:
        if deselected.ndim > m.ndim:  # packed layout: deselected [N, B]
            m = jnp.broadcast_to(m[..., None], deselected.shape)
        m = m & ~deselected
    return m


def masked_num_den(
    errors: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(numerator, denominator) of the masked mean, for [..., N, C...]
    errors and [..., N] row mask — THE single source of the masked-mean
    shape contract. Shape-polymorphic: single graphs ([N, C]), stacked
    batches ([B, N, C]), gradient tensors ([N, C, D]). The denominator is
    unclamped so sharded reducers (parallel/sp.make_sp_mean, the dp mean
    in training/step.py) can psum the parts before dividing."""
    mf = mask.astype(jnp.float32)
    extra = errors.shape[mask.ndim :]
    cols = 1
    for s in extra:
        cols *= int(s)
    m = mf.reshape(mf.shape + (1,) * len(extra))
    num = jnp.sum(errors.astype(jnp.float32) * m)
    return num, jnp.sum(mf) * cols


def _masked_mean(errors: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean(errors[mask]) — see :func:`masked_num_den`."""
    num, den = masked_num_den(errors, mask)
    return num / jnp.maximum(den, 1.0)


def _smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


# ----------------------------------------------------------------------
# data-space losses (normalized Δ)
# ----------------------------------------------------------------------

def l2_err_mask(graph, network_output, target, mask_types=DEFAULT_MASK_TYPES,
                deselected=None):
    """(squared error, node mask) of the masked MSE — the single source
    of the L2 masking semantics."""
    m = node_loss_mask(graph, mask_types, deselected)
    err = (network_output.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return err, m


def masked_l2_parts(graph, network_output, target, mask_types=DEFAULT_MASK_TYPES,
                    deselected=None):
    """(numerator, denominator) of the masked MSE, shared by
    :func:`l2_loss` and the sp training loss (which psums the parts
    across shards before dividing)."""
    return masked_num_den(
        *l2_err_mask(graph, network_output, target, mask_types, deselected)
    )


def l2_loss(inp: LossInputs, mask_types=DEFAULT_MASK_TYPES,
            mean_fn=None, **_) -> jnp.ndarray:
    """Masked MSE on normalized targets (loss.py:37-75).

    ``mean_fn`` (here and in every loss below) overrides the masked-mean
    reduction — the sp/dp training steps inject psum-ing reducers so the
    SAME term formulas run sharded (parallel/sp.py, training/step.py)."""
    err, m = l2_err_mask(
        inp.graph, inp.network_output, inp.target, mask_types, inp.deselected
    )
    return (mean_fn or _masked_mean)(err, m)


def cosine_loss(inp: LossInputs, mask_types=DEFAULT_MASK_TYPES,
                mean_fn=None, **_) -> jnp.ndarray:
    """Masked cosine-embedding loss, 1 − cos(out, target) (loss.py:78-122)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    a = inp.network_output.astype(jnp.float32)
    b = inp.target.astype(jnp.float32)
    eps = 1e-8
    cos = jnp.sum(a * b, -1) / (
        jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
        * jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    )
    return mean_fn(1.0 - cos, m)


def l1_smooth_loss(
    inp: LossInputs, mask_types=DEFAULT_MASK_TYPES, beta: float = 1.0,
    mean_fn=None, **_
) -> jnp.ndarray:
    """Masked smooth-L1 (loss.py:123-164)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    return mean_fn(_smooth_l1(inp.network_output - inp.target, beta), m)


# ----------------------------------------------------------------------
# physics losses (physical space, need gradients)
# ----------------------------------------------------------------------

def _ensure_gradients(
    inp: LossInputs, gradient_method: str, need_target: bool
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    g = inp.graph
    kw = dict(
        senders=g.senders,
        receivers=g.receivers,
        edge_mask=g.edge_mask,
        faces=g.faces,
        face_mask=g.face_mask,
        method=gradient_method,
    )
    out_grad = inp.network_output_gradient
    if out_grad is None:
        out_grad = voperators.gradient(g.pos, inp.network_output_physical, **kw)
    tgt_grad = inp.target_gradient
    if need_target and tgt_grad is None:
        tgt_grad = voperators.gradient(g.pos, inp.target_physical, **kw)
    return out_grad, tgt_grad


def gradient_l2_loss(
    inp: LossInputs,
    mask_types=DEFAULT_MASK_TYPES,
    gradient_method: str = "finite_diff",
    mean_fn=None,
    **_,
) -> jnp.ndarray:
    """L2 between spatial gradients of prediction and target (loss.py:167-218)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    out_grad, tgt_grad = _ensure_gradients(inp, gradient_method, need_target=True)
    return mean_fn((out_grad - tgt_grad) ** 2, m)


def convection_l2_loss(
    inp: LossInputs,
    mask_types=DEFAULT_MASK_TYPES,
    gradient_method: str = "finite_diff",
    mean_fn=None,
    **_,
) -> jnp.ndarray:
    """L2 between (u·∇)u terms of prediction and target (loss.py:221-277)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    out_grad, tgt_grad = _ensure_gradients(inp, gradient_method, need_target=True)
    out_conv = voperators.convection(inp.network_output_physical, out_grad)
    tgt_conv = voperators.convection(inp.target_physical, tgt_grad)
    return mean_fn((out_conv - tgt_conv) ** 2, m)


def divergence_l2_loss(
    inp: LossInputs,
    mask_types=DEFAULT_MASK_TYPES,
    gradient_method: str = "finite_diff",
    mean_fn=None,
    **_,
) -> jnp.ndarray:
    """L2 norm of ∇·u of the prediction (loss.py:280-324)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    out_grad, _ = _ensure_gradients(inp, gradient_method, need_target=False)
    div = voperators.divergence(out_grad)
    return mean_fn(div**2, m)


def divergence_l1_loss(
    inp: LossInputs,
    mask_types=DEFAULT_MASK_TYPES,
    gradient_method: str = "finite_diff",
    mean_fn=None,
    **_,
) -> jnp.ndarray:
    """L1 norm of ∇·u of the prediction (loss.py:327-371)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    out_grad, _ = _ensure_gradients(inp, gradient_method, need_target=False)
    return mean_fn(jnp.abs(voperators.divergence(out_grad)), m)


def divergence_l1_smooth_loss(
    inp: LossInputs,
    mask_types=DEFAULT_MASK_TYPES,
    gradient_method: str = "finite_diff",
    beta: float = 1.0,
    mean_fn=None,
    **_,
) -> jnp.ndarray:
    """Smooth-L1 of ∇·u against zero (loss.py:374-426)."""
    mean_fn = mean_fn or _masked_mean
    m = node_loss_mask(inp.graph, mask_types, inp.deselected)
    out_grad, _ = _ensure_gradients(inp, gradient_method, need_target=False)
    return mean_fn(_smooth_l1(voperators.divergence(out_grad), beta), m)


class LossType(enum.Enum):
    """Registry mirroring loss.py:485-493 (names match config strings)."""

    L2LOSS = ("MSE", l2_loss, False)
    COSINEL2LOSS = ("Cosine", cosine_loss, False)
    L1SMOOTHLOSS = ("L1Smooth", l1_smooth_loss, False)
    GRADIENTL2LOSS = ("GradientL2Loss", gradient_l2_loss, True)
    CONVECTIONL2LOSS = ("ConvectionL2Loss", convection_l2_loss, True)
    DIVERGENCEL2LOSS = ("DivergenceL2Loss", divergence_l2_loss, True)
    DIVERGENCEL1LOSS = ("DivergenceL1Loss", divergence_l1_loss, True)
    DIVERGENCEL1SMOOTHLOSS = ("DivergenceL1Smooth", divergence_l1_smooth_loss, True)

    @property
    def display_name(self) -> str:
        return self.value[0]

    @property
    def fn(self) -> Callable:
        return self.value[1]

    @property
    def needs_physical(self) -> bool:
        return self.value[2]


class MultiLoss:
    """Fixed-weight combination; shares the two gradient computations.

    Spec: loss.py:429-482. Callable like a single loss; returns
    (total, per-term list) when ``return_all_losses``.
    """

    def __init__(self, losses: List[LossType], weights: List[float]):
        assert len(losses) == len(weights)
        self.losses = losses
        self.weights = weights
        self.needs_physical = any(l.needs_physical for l in self.losses)

    def __call__(
        self,
        inp: LossInputs,
        mask_types=DEFAULT_MASK_TYPES,
        gradient_method: Optional[str] = "finite_diff",
        return_all_losses: bool = False,
        mean_fn=None,
    ):
        if gradient_method is not None and self.needs_physical:
            out_grad, tgt_grad = _ensure_gradients(
                inp, gradient_method, need_target=True
            )
            inp = inp.replace(
                network_output_gradient=out_grad, target_gradient=tgt_grad
            )
        terms = [
            w * l.fn(inp, mask_types=mask_types,
                     gradient_method=gradient_method, mean_fn=mean_fn)
            for w, l in zip(self.weights, self.losses)
        ]
        total = sum(terms)
        if return_all_losses:
            return total, terms
        return total
