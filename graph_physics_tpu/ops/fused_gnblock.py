"""Fused Pallas GraphNetBlock — the TPU hot-path kernel.

One grid step processes (lane-tile c, node-block g) and performs the whole
message-passing block in VMEM: sender gather → edge MLP (+RMSNorm tail) →
receiver scatter → node MLP (+RMSNorm tail) → residuals. Gathers/scatters
are windowed one-hot contractions on the MXU (see
:mod:`graph_physics_tpu.ops.tiling` for the blocked-CSR layout); HBM
traffic collapses to one read + one write of ``x`` and ``edge_attr`` per
block instead of the ~12 materialized intermediates of the XLA path.

Layout: packed training batches ([N, B, F], shared topology,
training/packed.py) viewed 2-D as [N, B*F] with F minor. A lane tile is
``lanes`` columns (default 512 = ``lanes//F`` batch samples). Per-sample
[F, F] weights are expanded block-diagonally to [128, 128] (kron with
I_{128/F}) and the activations are viewed as [rows·lanes/128, 128] around
each dense layer — a relayout-only reshape (row-major order is unchanged)
— so every MLP layer is ONE large MXU matmul at full lane width even at
hidden 32, instead of per-sample thin GEMMs.

Backward is a second Pallas kernel (custom VJP): it rematerializes the
forward from (x, e) — nothing but the inputs is saved — and accumulates
weight gradients in fp32 VMEM across all grid steps. Sender-window
gradient contributions overlap between node blocks, so they are emitted
per-(block, window) and reduced with one XLA segment-sum epilogue.

Replaces the reference hot loop graphphysics/models/layers.py:1015-1102
(gather → edge MLP → scatter_add → node MLP with residuals); numerics
match :class:`graph_physics_tpu.models.layers.GraphNetBlock` (relu/silu/
gelu activations, RMSNorm tails, fp32 statistics).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_physics_tpu.ops.tiling import EdgeTiling

LANES = 128  # MXU lane width; weights are packed to this

#: lane-tile caps for the folded-encoder (block 0) kernels — its
#: rematerialized encoder pre-activations enlarge the VMEM working set.
#: The BWD cap also sets the raw-edge channel packing ratio r (r must
#: divide every lane count / LANES): lb=128 forces r=1 — the raw
#: 3-channel edge array padded to full hidden width (94 MB/step on the
#: cylinder bench) — while lb=256 admits r=2. Env-overridable for
#: on-TPU sweeps (scripts/sweep_glue.py).
FOLDED_LANES_CAP = int(os.environ.get("GP_FOLDED_LANES", "512"))
FOLDED_LANES_BWD_CAP = int(os.environ.get("GP_FOLDED_LANES_BWD", "128"))

#: Mosaic scoped-VMEM limit per fused kernel (None = the 16 MiB
#: default). v5e has 128 MiB of VMEM; wider folded tiles (lanes_bwd 256
#: at raw-channel packing r=2) overflow the default by ~2 MiB, so the
#: sweeps raise this together with the lane caps.
VMEM_LIMIT_BYTES = (
    int(os.environ["GP_VMEM_LIMIT_MB"]) * 2**20
    if os.environ.get("GP_VMEM_LIMIT_MB")
    else None
)


@dataclass(frozen=True)
class FusedBlockConfig:
    feature_size: int  # F == hidden size of the block
    n_edge_layers: int  # Dense count in the edge MLP (reference: 4)
    n_node_layers: int
    activation: str = "relu"
    layer_norm: bool = True
    rms_eps: float = 1e-8
    interpret: bool = False  # Pallas interpreter (CPU tests)
    #: >0: the edge ENCODER MLP is folded into this (first) block's kernels
    #: — the e input is the raw [.., B*fe_pad] feature array and the huge
    #: encoded-edge array never round-trips HBM (nor does its XLA fwd/bwd
    #: run outside the kernel)
    n_enc_layers: int = 0
    #: raw features are channel-padded to fe_pad = F // enc_ratio
    enc_ratio: int = 1
    #: last block of the processor: its edge output is dead (only x feeds
    #: the decoder) — skip the eout write (fwd) and the g_eout read (bwd)
    last_block: bool = False
    #: an extra NODE-aligned aggregate input joins the message sum before
    #: the node MLP (the world-edge sidecar's per-sample scatter, computed
    #: in XLA — models/layers.GraphNetBlock). Node-sized seam: no new
    #: edge-row HBM streams; the backward exports its cotangent (= the
    #: aggregation gradient, which it computes anyway)
    has_extra_agg: bool = False


# ----------------------------------------------------------------------
# small in-kernel helpers
# ----------------------------------------------------------------------

def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """In-kernel fp32 erf.

    Mosaic has NO lowering for ``lax.erf``/``erfc`` (KernelType.TC
    "Unimplemented primitive"), so the exact-erf GELU cannot call them
    inside a Pallas TPU kernel. This is Abramowitz & Stegun 7.1.26 —
    max abs error 1.5e-7, far below bf16 resolution (~8e-3) and the
    1e-5 cross-framework parity tolerances. Used on CPU (interpret
    mode) too so the parity tests validate this exact code path.
    """
    x = x.astype(jnp.float32)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _act(name: str):
    # "gelu" is the exact (erf) form, matching the reference's torch
    # nn.GELU default — NOT jax.nn.gelu's tanh approximation
    # (models/layers.gelu_exact is the XLA-side twin). erf comes from
    # the in-kernel polynomial above (Mosaic cannot lower lax.erf).
    def gelu(x):
        xf = x.astype(jnp.float32)
        return (0.5 * xf * (1.0 + _erf(xf / math.sqrt(2.0)))).astype(x.dtype)

    return {
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "gelu": gelu,
    }[name]


def _act_grad(name: str, pre: jnp.ndarray) -> jnp.ndarray:
    """Elementwise activation derivative at ``pre`` (fp32)."""
    if name == "relu":
        # compare in fp32: bf16 compares are unsupported on some targets
        return (pre.astype(jnp.float32) > 0).astype(pre.dtype)
    if name == "silu":
        s = jax.nn.sigmoid(pre)
        return s * (1.0 + pre * (1.0 - s))
    if name == "gelu":  # exact form: d/dx [x·Φ(x)] = Φ(x) + x·φ(x)
        x = pre.astype(jnp.float32)
        phi_cdf = 0.5 * (1.0 + _erf(x / math.sqrt(2.0)))
        pdf = jnp.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)
        return (phi_cdf + x * pdf).astype(pre.dtype)
    raise NotImplementedError(name)


def _group_ones(f: int) -> jnp.ndarray:
    """[LANES, LANES] bf16 block matrix: 1 where i//f == j//f (for per-
    F-group lane reductions via one fp32-accumulating MXU contraction)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return ((i // f) == (j // f)).astype(jnp.bfloat16)


def _dot(a, b):  # [M,K]@[K,N] fp32 accumulation
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_t(a, b):  # aᵀ@b with contraction over rows: [K,M],[K,N] -> [M,N]
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_bt(a, b):  # a@bᵀ: [M,K],[N,K] -> [M,N]
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _rms_fwd(pre_bf: jnp.ndarray, ones_k: jnp.ndarray, scale: jnp.ndarray,
             f: int, eps: float):
    """RMSNorm per F-lane-group; matches models/layers.RMSNorm numerics
    (statistics accumulated in fp32; activations bf16).

    Returns (y_bf, u_bf, inv_denom_f32) for reuse in backward.
    """
    sq = pre_bf * pre_bf  # bf16 squares, fp32 accumulation in the dot
    gs = _dot(sq, ones_k)  # per-group Σv² broadcast to every lane of group
    rms = jnp.sqrt(gs + 1e-24) / math.sqrt(f)
    inv = 1.0 / (rms + eps)
    u = pre_bf * inv.astype(jnp.bfloat16)
    return u * scale.astype(jnp.bfloat16), u, inv


# ----------------------------------------------------------------------
# shared MLP fwd/bwd (operating on the [rows, 128] view)
# ----------------------------------------------------------------------

def _rms_bwd(g_bf, v_bf, u_bf, inv_f32, scale_f32, ones_k, f: int,
             eps: float):
    """VJP of :func:`_rms_fwd` wrt the pre-norm input ``v``.

    Returns (g_input_bf16, d_scale_f32 [1, 128]). ``u = v·inv`` with
    ``inv = 1/(rms+eps)``; same numerics as the inline block the MLP
    backward uses.
    """
    scale = scale_f32.astype(jnp.bfloat16)
    d_scale = jnp.sum((g_bf * u_bf).astype(jnp.float32), axis=0, keepdims=True)
    g_u = g_bf * scale
    dot_gv = _dot(g_u * v_bf, ones_k)
    rms = 1.0 / inv_f32 - eps
    safe_rms = jnp.maximum(rms, 1e-30)
    corr = (dot_gv * (inv_f32 * inv_f32) / (f * safe_rms)).astype(jnp.bfloat16)
    return g_u * inv_f32.astype(jnp.bfloat16) - v_bf * corr, d_scale


def _mlp_fwd(h0_f32, kern_refs, bias_refs, scale_ref, ones_k, cfg):
    """Dense chain + optional RMSNorm tail. ``h0_f32`` is the first-layer
    pre-activation WITHOUT bias (fp32 from the MXU). Activations flow in
    bf16 (matching the XLA path's Dense(dtype=bf16) semantics); fp32 only
    inside dot accumulation and the RMS statistics.
    Returns (out_bf16, (pres_bf16, rms_res))."""
    act = _act(cfg.activation)
    pres: List[jnp.ndarray] = []
    h = h0_f32.astype(jnp.bfloat16) + bias_refs[0][:].astype(jnp.bfloat16)
    pres.append(h)
    z = act(h)
    for i, kref in enumerate(kern_refs):
        is_last = i == len(kern_refs) - 1
        h = _dot(z, kref[:]).astype(jnp.bfloat16) + bias_refs[i + 1][:].astype(jnp.bfloat16)
        pres.append(h)
        if not is_last:
            z = act(h)
    out = h
    rms_res = None
    if cfg.layer_norm:
        out, u, inv = _rms_fwd(h, ones_k, scale_ref[:],
                               cfg.feature_size, cfg.rms_eps)
        rms_res = (u, inv)
    return out, (pres, rms_res)


def _mlp_bwd(g_out_bf, inputs_bf16: Sequence[jnp.ndarray],
             first_refs, kern_refs, bias_refs, scale_ref, ones_k, cfg,
             pres, rms_res):
    """Backward through the dense chain (bf16 gradient flow, fp32 dot
    accumulation). Returns (grads wrt each first-layer input [bf16],
    flat weight-grad list in _flatten_mlp order, gradient at the
    first-layer pre-activation h0 [bf16] — for callers whose first layer
    has a non-standard input view, e.g. the folded encoder)."""
    act = _act(cfg.activation)
    g = g_out_bf
    d_scale = None
    if cfg.layer_norm:
        u, inv = rms_res  # u bf16, inv f32
        scale = scale_ref[:].astype(jnp.bfloat16)
        d_scale = jnp.sum((g * u).astype(jnp.float32), axis=0, keepdims=True)
        g_u = g * scale
        # u = v·inv, inv = 1/(rms+eps), rms = sqrt(Σv²+tiny)/√f
        v = pres[-1]
        dot_gv = _dot(g_u * v, ones_k)  # per-group Σ g_u·v, fp32
        rms = 1.0 / inv - cfg.rms_eps
        safe_rms = jnp.maximum(rms, 1e-30)
        corr = (dot_gv * (inv * inv) / (cfg.feature_size * safe_rms)).astype(
            jnp.bfloat16
        )
        g = g_u * inv.astype(jnp.bfloat16) - v * corr

    d_kerns = [None] * len(kern_refs)
    d_biases = [None] * len(bias_refs)
    for i in reversed(range(len(kern_refs))):
        d_biases[i + 1] = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        # recompute act(pres[i]) at use: shortest possible liveness (the
        # full zs list held n_layers-1 extra edge-row tensors in VMEM)
        d_kerns[i] = _dot_t(act(pres[i]), g)
        g = _dot_bt(g, kern_refs[i][:]).astype(jnp.bfloat16)
        g = g * _act_grad(cfg.activation, pres[i])
    d_biases[0] = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    d_first = [_dot_t(inp, g) for inp in inputs_bf16]
    g_inputs = [_dot_bt(g, fref[:]).astype(jnp.bfloat16) for fref in first_refs]
    # flat order must mirror _flatten_mlp: firsts, b0, (k_i, b_i)..., scale
    flat = list(d_first) + [d_biases[0]]
    for k, b_ in zip(d_kerns, d_biases[1:]):
        flat += [k, b_]
    if cfg.layer_norm:
        flat.append(d_scale)
    return g_inputs, flat, g


def _parse_weight_refs(refs, n_first: int, n_layers: int, layer_norm: bool):
    """refs layout: n_first first-layer kernels, then bias0, then
    (kernel_i, bias_i) for i=1..n_layers-1, then optional scale."""
    i = 0
    first = refs[i : i + n_first]; i += n_first
    biases = [refs[i]]; i += 1
    kerns = []
    for _ in range(n_layers - 1):
        kerns.append(refs[i]); i += 1
        biases.append(refs[i]); i += 1
    scale = None
    if layer_norm:
        scale = refs[i]; i += 1
    return first, kerns, biases, scale, refs[i:]


# ----------------------------------------------------------------------
# kernels
# ----------------------------------------------------------------------

def _common_prologue(cfg, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref,
                     xj_ref, xw_refs):
    """One-hot builds shared by fwd and bwd.

    Node features are NOT gathered to edge rows here: both kernels commute
    the gather through the first-layer kernels instead (pre-multiply the
    [node, lanes] tiles by Kr/Ks, THEN gather — ``gather(x) @ K ==
    gather(x @ K)`` since the one-hot contraction selects/sums rows), which
    replaces per-EDGE-row first-layer matmuls with per-NODE-row ones
    (~6x fewer rows on mesh graphs).
    """
    k = lanes // LANES
    w_rows = wb * wu
    xw = jnp.concatenate([r[:] for r in xw_refs], axis=0)  # [W, lanes]
    xj = xj_ref[:]  # [NB, lanes]
    sid = sidx_ref[0]  # [1, Emax]
    rid = ridx_ref[0]
    oh_sT = (
        jax.lax.broadcasted_iota(jnp.int32, (w_rows, emax), 0) == sid
    ).astype(jnp.bfloat16)  # [W, Emax]
    oh_rN = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, emax), 0) == rid
    ).astype(jnp.bfloat16)  # [NB, Emax]
    xjr = xj.reshape(nb * k, LANES)
    xwr = xw.reshape(w_rows * k, LANES)
    return k, xj, xw, oh_sT, oh_rN, xjr, xwr


def _predot_gather(oh, vals_2d, kref, k):
    """``gather(vals) @ K`` computed as ``gather(vals @ K)``.

    Pre-multiplies in the rows view (node rows — cheap), casts the fp32
    partial to bf16 (the only precision difference vs the post-gather
    order: partial sums round to bf16 before the final h0 add), gathers in
    the 2-D lane view with fp32 MXU accumulation. Returns the [rows_out,
    lanes] bf16 gathered pre-dot; reshape to the rows view at the caller.
    """
    m = vals_2d.shape[0]
    pre = _dot(vals_2d.reshape(m * k, LANES), kref[:]).astype(jnp.bfloat16)
    pre2 = pre.reshape(m, k * LANES)
    return _dot_t(oh, pre2).astype(jnp.bfloat16)


def _encode_e_fwd(cfg, emax, lanes, e_ref, enc_refs, ones_k):
    """Run the folded edge encoder: raw [Emax, lanes/r] -> hidden rows
    view [Emax*k, 128].

    The first layer maps each 128-lane raw slice through the [128, r*128]
    block-diagonal kernel and concatenates along lanes — sample order is
    preserved without any cross-lane row interleave (which Mosaic cannot
    relayout); the [Emax, lanes] -> [Emax*k, 128] reshape afterwards is the
    same row-major view the non-folded path uses.
    """
    r = cfg.enc_ratio
    k = lanes // LANES
    raw = e_ref[:]  # [Emax, lanes // r]
    k_raw = (lanes // r) // LANES
    enc_first, enc_mid, enc_b, enc_scale = enc_refs
    w1 = enc_first[0][:]
    # bf16 before the view change: _mlp_fwd casts immediately anyway, and
    # Mosaic handles the [Emax, lanes] -> [Emax*k, 128] relayout in bf16
    # (the same one the non-folded path does on e) but not in fp32
    segs = [
        _dot(raw[:, j * LANES : (j + 1) * LANES], w1).astype(jnp.bfloat16)
        for j in range(k_raw)
    ]  # each [Emax, r*128]
    h0_2d = segs[0] if k_raw == 1 else jnp.concatenate(segs, axis=1)
    h0 = h0_2d.reshape(emax * k, LANES)
    out, res = _mlp_fwd(h0, enc_mid, enc_b, enc_scale, ones_k, _enc_cfg(cfg))
    return raw, out, res  # out: [Emax*k, 128] bf16 hidden rows


def _enc_cfg(cfg):
    """Config view with the encoder's layer count (for _mlp_fwd/_mlp_bwd)."""
    import dataclasses

    return dataclasses.replace(cfg, n_edge_layers=cfg.n_enc_layers,
                               n_node_layers=cfg.n_enc_layers)


def _fwd_kernel(cfg: FusedBlockConfig, wb: int, wu: int, nb: int, emax: int,
                lanes: int, win_start_ref, sidx_ref, ridx_ref, xj_ref, *rest):
    xw_refs = rest[:wb]
    rest = rest[wb:]
    e_ref = rest[0]
    rest = rest[1:]
    ea_ref = None
    if cfg.has_extra_agg:
        ea_ref = rest[0]
        rest = rest[1:]
    enc_refs = None
    if cfg.n_enc_layers:
        enc_first, enc_mid, enc_b, enc_scale, rest = _parse_weight_refs(
            rest, 1, cfg.n_enc_layers, cfg.layer_norm)
        enc_refs = (enc_first, enc_mid, enc_b, enc_scale)
    ew_first, ew_mid, ew_b, ew_scale, rest = _parse_weight_refs(
        rest, 3, cfg.n_edge_layers, cfg.layer_norm)
    nw_first, nw_mid, nw_b, nw_scale, rest = _parse_weight_refs(
        rest, 2, cfg.n_node_layers, cfg.layer_norm)
    if cfg.last_block:
        (xout_ref,) = rest
        eout_ref = None
    else:
        xout_ref, eout_ref = rest

    ones_k = _group_ones(cfg.feature_size)
    k, xj, xw, oh_sT, oh_rN, xjr, xwr = _common_prologue(
        cfg, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref, xj_ref, xw_refs)

    if enc_refs is not None:
        _raw, er_rows, _enc_res = _encode_e_fwd(
            cfg, emax, lanes, e_ref, enc_refs, ones_k)
        er = er_rows
        e = er_rows.reshape(emax, lanes)
    else:
        e = e_ref[:]  # [Emax, lanes]
        er = e.reshape(emax * k, LANES)

    # edge MLP; first layer = e@Ke + xr@Kr + xs@Ks (concat order of the
    # reference: [edge_attr, x_recv, x_send], layers.py:1044-1060).
    # The xr/xs terms are computed gather-after-pre-dot (node rows, not
    # edge rows — see _predot_gather).
    hr = _predot_gather(oh_rN, xj, ew_first[1], k)  # [Emax, lanes] bf16
    hs = _predot_gather(oh_sT, xw, ew_first[2], k)
    h0 = (_dot(er, ew_first[0][:])
          + hr.reshape(emax * k, LANES) + hs.reshape(emax * k, LANES))
    edge_upd, _ = _mlp_fwd(h0, ew_mid, ew_b, ew_scale, ones_k, cfg)
    eh = edge_upd.reshape(emax, lanes)
    if eout_ref is not None:
        eout_ref[:] = e + eh

    agg = _dot(oh_rN, eh).astype(jnp.bfloat16)  # [NB, lanes] masked scatter
    if ea_ref is not None:
        agg = agg + ea_ref[:]
    aggr = agg.reshape(nb * k, LANES)

    hn0 = _dot(xjr, nw_first[0][:]) + _dot(aggr, nw_first[1][:])
    node_upd, _ = _mlp_fwd(hn0, nw_mid, nw_b, nw_scale, ones_k, cfg)
    xout_ref[:] = xj + node_upd.reshape(nb, lanes)


def _bwd_kernel(cfg: FusedBlockConfig, wb: int, wu: int, nb: int, emax: int,
                lanes: int, win_start_ref, sidx_ref, ridx_ref, xj_ref, *rest):
    xw_refs = rest[:wb]
    rest = rest[wb:]
    e_ref = rest[0]
    rest = rest[1:]
    ea_ref = None
    if cfg.has_extra_agg:
        ea_ref = rest[0]
        rest = rest[1:]
    enc_refs = None
    if cfg.n_enc_layers:
        enc_first, enc_mid, enc_b, enc_scale, rest = _parse_weight_refs(
            rest, 1, cfg.n_enc_layers, cfg.layer_norm)
        enc_refs = (enc_first, enc_mid, enc_b, enc_scale)
    ew_first, ew_mid, ew_b, ew_scale, rest = _parse_weight_refs(
        rest, 3, cfg.n_edge_layers, cfg.layer_norm)
    nw_first, nw_mid, nw_b, nw_scale, rest = _parse_weight_refs(
        rest, 2, cfg.n_node_layers, cfg.layer_norm)
    if cfg.last_block:
        g_xout_ref = rest[0]
        g_eout_ref = None
        rest = rest[1:]
    else:
        g_xout_ref, g_eout_ref = rest[:2]
        rest = rest[2:]
    dx_ref, dxw_ref = rest[:2]
    rest = rest[2:]
    dea_ref = None
    if cfg.has_extra_agg:
        dea_ref = rest[0]
        rest = rest[1:]
    if cfg.n_enc_layers:
        de_ref = None  # raw edge features carry no gradient
        dw_all = rest
    else:
        de_ref = rest[0]
        dw_all = rest[1:]
    # trailing half: VMEM scratch accumulators (persist across the grid);
    # the dw OUTPUT windows are written once, on the last grid step
    n_dw = len(dw_all) // 2
    dw_refs = dw_all[:n_dw]
    dw_scratch = dw_all[n_dw:]

    ones_k = _group_ones(cfg.feature_size)
    k, xj, xw, oh_sT, oh_rN, xjr, xwr = _common_prologue(
        cfg, wb, wu, nb, emax, lanes, sidx_ref, ridx_ref, xj_ref, xw_refs)

    # ---- recompute forward ----
    if enc_refs is not None:
        raw, er, enc_res = _encode_e_fwd(
            cfg, emax, lanes, e_ref, enc_refs, ones_k)
        e = er.reshape(emax, lanes)
    else:
        e = e_ref[:]
        er = e.reshape(emax * k, LANES)
    hr = _predot_gather(oh_rN, xj, ew_first[1], k)
    hs = _predot_gather(oh_sT, xw, ew_first[2], k)
    h0 = (_dot(er, ew_first[0][:])
          + hr.reshape(emax * k, LANES) + hs.reshape(emax * k, LANES))
    edge_upd, (e_pres, e_rms) = _mlp_fwd(h0, ew_mid, ew_b, ew_scale, ones_k, cfg)
    eh = edge_upd.reshape(emax, lanes)
    agg = _dot(oh_rN, eh).astype(jnp.bfloat16)
    if ea_ref is not None:
        agg = agg + ea_ref[:]
    aggr = agg.reshape(nb * k, LANES)
    hn0 = _dot(xjr, nw_first[0][:]) + _dot(aggr, nw_first[1][:])
    _node_upd, (n_pres, n_rms) = _mlp_fwd(hn0, nw_mid, nw_b, nw_scale, ones_k, cfg)

    # ---- backward (bf16 gradient flow) ----
    g_xout = g_xout_ref[:]  # [NB, lanes] bf16
    g_eout = g_eout_ref[:] if g_eout_ref is not None else None
    g_xout_r = g_xout.reshape(nb * k, LANES)

    (g_xj_n, g_agg_r), dn_flat, _ = _mlp_bwd(
        g_xout_r, [xjr, aggr], nw_first, nw_mid, nw_b, nw_scale, ones_k, cfg,
        n_pres, n_rms)

    # eh receives gradient from both the agg scatter and the edge residual
    g_agg = g_agg_r.reshape(nb, lanes)
    if dea_ref is not None:
        # the extra aggregate joins agg by identity add — its cotangent
        # IS the aggregation gradient
        dea_ref[:] = g_agg
    g_eh = _dot_t(oh_rN, g_agg).astype(jnp.bfloat16)
    if g_eout is not None:
        g_eh = g_eout + g_eh
    g_eh_r = g_eh.reshape(emax * k, LANES)

    # backprop through the edge MLP wrt the er input only; the xr/xs
    # first-layer terms are handled below via P = oh @ g_h0 (the scatter
    # commuted through Kr/Ks — one [node-rows] matmul replaces the
    # [edge-rows] dW/dx pair, and P is shared between dW and dx)
    (g_e_mlp,), de_flat, g_h0 = _mlp_bwd(
        g_eh_r, [er], ew_first[:1], ew_mid, ew_b, ew_scale, ones_k, cfg,
        e_pres, e_rms)
    g_h0_2d = g_h0.reshape(emax, lanes)  # bf16
    p_r = _dot(oh_rN, g_h0_2d).astype(jnp.bfloat16)  # [NB, lanes]
    p_s = _dot(oh_sT, g_h0_2d).astype(jnp.bfloat16)  # [W, lanes]
    p_r_rows = p_r.reshape(nb * k, LANES)
    p_s_rows = p_s.reshape(wb * wu * k, LANES)
    d_kr = _dot_t(xjr, p_r_rows)  # [128, 128] fp32
    d_ks = _dot_t(xwr, p_s_rows)
    de_flat = [de_flat[0], d_kr, d_ks] + de_flat[1:]

    # gradient wrt the residual-stream e (encoder output when folded):
    # identity residual (g_eout) + edge-MLP first-layer backprop
    g_e_total_r = g_e_mlp
    if g_eout is not None:
        g_e_total_r = g_e_total_r + g_eout.reshape(emax * k, LANES)
    if de_ref is not None:
        de_ref[:] = g_e_total_r.reshape(emax, lanes)

    enc_flat: List[jnp.ndarray] = []
    if enc_refs is not None:
        enc_first, enc_mid, enc_b, enc_scale = enc_refs
        _gi, enc_tail, g_h0_enc = _mlp_bwd(
            g_e_total_r, [], [], enc_mid, enc_b, enc_scale, ones_k,
            _enc_cfg(cfg), enc_res[0], enc_res[1])
        # mirror the per-slice first layer: dW1 = Σ_j raw_jᵀ @ g_h0_j
        r = cfg.enc_ratio
        k_raw = (lanes // r) // LANES
        g_h0_2d = g_h0_enc.reshape(emax, lanes)
        d_enc_first = sum(
            _dot_t(
                raw[:, j * LANES : (j + 1) * LANES],
                g_h0_2d[:, j * r * LANES : (j + 1) * r * LANES],
            )
            for j in range(k_raw)
        )  # [128, r*128]
        enc_flat = [d_enc_first] + enc_tail

    # dx contribution of the Kr path: (oh_rN @ g_h0) @ Krᵀ (pre-scattered
    # P reused); same for the sender windows with Ks
    g_x_kr = _dot_bt(p_r_rows, ew_first[1][:]).astype(jnp.bfloat16)
    dx_ref[:] = (
        g_xout + g_xj_n.reshape(nb, lanes) + g_x_kr.reshape(nb, lanes)
    )
    dxw_ref[:] = _dot_bt(p_s_rows, ew_first[2][:]).astype(
        jnp.bfloat16).reshape(wb * wu, lanes)

    # ---- weight-grad accumulation across all grid steps ----
    # fp32 VMEM SCRATCH (not the output windows: accumulating into an
    # output ref makes Mosaic stage the window through its double-buffered
    # output path every step; scratch persists across the grid for free)
    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    is_last = (pl.program_id(0) == pl.num_programs(0) - 1) & (
        pl.program_id(1) == pl.num_programs(1) - 1)
    for sref, oref, val in zip(dw_scratch, dw_refs,
                               enc_flat + de_flat + dn_flat):

        @pl.when(is_first)
        def _(sref=sref):
            sref[:] = jnp.zeros_like(sref)

        sref[:] += val.astype(jnp.float32)

        @pl.when(is_last)
        def _(sref=sref, oref=oref):
            oref[:] = sref[:]


def _drop_refs(kernel, n_reg, n_prev, *refs):
    """Strip the aliased prev-bucket output operands — inserted between
    the regular inputs and the outputs purely for buffer aliasing — before
    calling the real kernel (which never reads them)."""
    return kernel(*refs[:n_reg], *refs[n_reg + n_prev:])


# ----------------------------------------------------------------------
# host-side wrapper: kron packing, pallas_call plumbing, custom VJP
# ----------------------------------------------------------------------

def _kron_expand(w: jnp.ndarray, bg: int) -> jnp.ndarray:
    """[F, F] -> block-diagonal [bg*F, bg*F] (differentiable)."""
    if bg == 1:
        return w
    f = w.shape[0]
    eye = jnp.eye(bg, dtype=w.dtype)
    return jnp.einsum("ab,ij->aibj", eye, w).reshape(bg * f, bg * f)


def _tile_vec(v: jnp.ndarray, bg: int) -> jnp.ndarray:
    """[F] -> [1, bg*F]."""
    return jnp.tile(v, bg)[None, :]


def _flatten_mlp(params: dict, f_in_parts: int, bg: int, dtype,
                 layer_norm: bool):
    """flax MLP param dict -> flat kron-packed list matching
    _parse_weight_refs order. First kernel [n_parts*F, F] is split."""
    n_dense = len([k for k in params if k.startswith("Dense_")])
    k0 = params["Dense_0"]["kernel"]
    f = k0.shape[1]
    firsts = [
        _kron_expand(k0[i * f : (i + 1) * f].astype(dtype), bg)
        for i in range(f_in_parts)
    ]
    out = list(firsts)
    out.append(_tile_vec(params["Dense_0"]["bias"].astype(jnp.float32), bg))
    for i in range(1, n_dense):
        out.append(_kron_expand(params[f"Dense_{i}"]["kernel"].astype(dtype), bg))
        out.append(_tile_vec(params[f"Dense_{i}"]["bias"].astype(jnp.float32), bg))
    if layer_norm:
        out.append(_tile_vec(params["RMSNorm_0"]["scale"].astype(jnp.float32), bg))
    return out, n_dense


def _flatten_encoder(params: dict, r: int, f: int, dtype, layer_norm: bool):
    """Folded-encoder params -> flat packed list.

    First kernel [fe, F] is zero-padded to [F//r, F] and expanded
    block-diagonally to [LANES, r*LANES] (one raw 128-lane row produces r
    hidden 128-lane rows); remaining layers pack like _flatten_mlp.
    """
    bg = LANES // f
    fe_pad = f // r
    n_dense = len([k for k in params if k.startswith("Dense_")])
    k0 = params["Dense_0"]["kernel"].astype(dtype)  # [fe, F]
    fe = k0.shape[0]
    assert fe <= fe_pad, (fe, fe_pad)
    k0p = jnp.zeros((fe_pad, f), dtype).at[:fe].set(k0)
    blocks = LANES // fe_pad
    eye = jnp.eye(blocks, dtype=dtype)
    first = jnp.einsum("ab,ij->aibj", eye, k0p).reshape(LANES, blocks * f)
    out = [first, _tile_vec(params["Dense_0"]["bias"].astype(jnp.float32), bg)]
    for i in range(1, n_dense):
        out.append(_kron_expand(params[f"Dense_{i}"]["kernel"].astype(dtype), bg))
        out.append(_tile_vec(params[f"Dense_{i}"]["bias"].astype(jnp.float32), bg))
    if layer_norm:
        out.append(_tile_vec(params["RMSNorm_0"]["scale"].astype(jnp.float32), bg))
    return out, n_dense


def fused_gn_block(
    x: jnp.ndarray,  # [N, B, F] packed node features
    edge_attr: jnp.ndarray,  # [G*Emax, B, F] blocked packed edge features
    #                          (raw [G*Emax, B, fe] with edge_encoder_params)
    edge_params: dict,  # flax params of the edge MLP (Dense_i, RMSNorm_0)
    node_params: dict,
    tiling: EdgeTiling,
    activation: str = "relu",
    layer_norm: bool = True,
    interpret: bool = False,
    lanes: int = 1024,
    lanes_bwd: int = 256,
    edge_encoder_params: Optional[dict] = None,
    last_block: bool = False,
    tiling_idx: Optional[Tuple] = None,
    extra_agg: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply one fused GraphNetBlock; returns (x', edge_attr').

    ``extra_agg``: optional [N, B, F] node-aligned aggregate added to the
    in-kernel message sum before the node MLP (the world-edge sidecar's
    per-sample scatter). Differentiable: the backward kernel exports its
    cotangent (the aggregation gradient it computes anyway) — a node-sized
    seam with no new edge-row HBM traffic.

    ``tiling_idx``: optional runtime ``(win_start, sidx, ridx)`` arrays
    (graph.tiling_idx). When given they are used as TRACED inputs instead
    of the tiling's host constants, so one jitted program serves every
    topology of the same shape bucket; ``tiling`` then only supplies the
    static geometry (node_block/window_blocks/edges_per_block/...).

    ``lanes`` / ``lanes_bwd`` pick the lane-tile width of the forward /
    backward kernels (backward holds ~3x the VMEM working set — the
    rematerialized layer pre-activations — so it runs narrower tiles).

    ``edge_encoder_params`` folds the edge ENCODER MLP into this (first)
    block: ``edge_attr`` is then the raw [G*Emax, B, fe] feature array and
    the full-size encoded-edge array never exists in HBM (the encoder
    runs in-kernel in both fwd and bwd; raw features get no cotangent).
    ``last_block`` elides the dead edge-output traffic of the final block
    (only x feeds the decoder): its fwd skips the eout write, its bwd the
    g_eout read; the returned edge array is the (dead) input, unchanged.
    """
    n, b, f = x.shape
    assert LANES % f == 0, f"feature size {f} must divide {LANES}"
    bg = LANES // f
    total_lanes = b * f
    assert total_lanes % LANES == 0, (
        f"batch {b} x feature {f} must tile {LANES} lanes")

    def _fit(l):
        l = max(min(l, total_lanes), LANES)
        while total_lanes % l != 0:  # shrink to a divisor of the lane count
            l -= LANES
        return l

    folded = edge_encoder_params is not None

    def _caps(win_rows_b, l, lb, aliased=False):
        """Lane-tile caps for one bucket's window width (VMEM budget).

        ``aliased``: bucket > 0 of a multi-bucket dispatch — its kernels
        carry the previous bucket's outputs as aliased inputs, whose
        constant-index block fetches add ~0.5 MB to a backward working
        set already within ~1 MB of the 16 MB scoped-VMEM limit at wide
        windows (measured: wb=18 airfoil bucket OOMs by 1.28 MB at
        lanes_bwd 256); such buckets take the multi-chunk 128-lane
        backward width, which is measured safe."""
        if folded:
            # the folded encoder adds its rematerialized pre-activations
            # to the VMEM working set; narrower tiles keep it under the
            # ~16 MB budget (module-level knobs so perf sweeps can retune)
            l = min(l, FOLDED_LANES_CAP)
            lb = min(lb, FOLDED_LANES_BWD_CAP)
        if win_rows_b > 512:
            # wide-window tilings (irregular meshes, e.g. the 27k airfoil
            # at 18 units): window reads + the [win_rows, Emax] one-hot
            # blow the scoped-VMEM budget at full lane width — measured
            # OOM at fwd 1024 lanes, and a marginal 0.7 MB bwd overrun at
            # 256 lanes when the grid has multiple lane chunks; (512, 256)
            # at a single chunk and (512, 128) multi-chunk measured safe
            l = min(l, 512)
            lb = min(lb, 256 if total_lanes <= 512 else 128)
            if aliased:
                lb = min(lb, 128)
        if win_rows_b > 1280:
            l = min(l, 256)
            lb = min(lb, 128)
        return _fit(l), _fit(lb)

    assert n == tiling.num_nodes, (n, tiling.num_nodes)
    g_blocks = tiling.num_groups
    emax = tiling.edges_per_block
    nb = tiling.node_block
    wb = tiling.window_blocks
    wu = tiling.window_unit
    assert edge_attr.shape[0] == g_blocks * emax
    # window-count buckets (tiling.buckets, groups pre-sorted by touched
    # units): one pallas_call per bucket so low-window groups stop paying
    # the global max wb; each bucket gets its own (possibly wider) lane
    # caps from its own window width
    buckets = tiling.buckets or ((0, g_blocks, wb),)
    assert buckets[0][0] == 0 and buckets[-1][1] == g_blocks, buckets
    lane_plan = [_caps(wb_b * wu, lanes, lanes_bwd, aliased=(bi > 0))
                 for bi, (_lo, _hi, wb_b) in enumerate(buckets)]

    # folded-encoder geometry: raw rows carry fe_pad = F/r channels per
    # sample so every lane tile (fwd AND bwd, every bucket) stays
    # 128-aligned
    r = 1
    if folded:
        ks = [v // LANES for pair in lane_plan for v in pair]
        fe = edge_attr.shape[-1]
        for cand in range(min(ks), 0, -1):
            if (all(kk % cand == 0 for kk in ks) and f % cand == 0
                    and f // cand >= fe):
                r = cand
                break
        assert f // r >= fe, "raw edge features wider than hidden size"

    n_edge_layers = len([k for k in edge_params if k.startswith("Dense_")])
    n_node_layers = len([k for k in node_params if k.startswith("Dense_")])
    n_enc_layers = 0
    if edge_encoder_params is not None:
        n_enc_layers = len(
            [k for k in edge_encoder_params if k.startswith("Dense_")]
        )
    has_extra = extra_agg is not None
    cfg = FusedBlockConfig(
        feature_size=f,
        n_edge_layers=n_edge_layers,
        n_node_layers=n_node_layers,
        activation=activation,
        layer_norm=layer_norm,
        interpret=interpret,
        n_enc_layers=n_enc_layers,
        enc_ratio=r,
        last_block=last_block,
        has_extra_agg=has_extra,
    )

    dtype = jnp.bfloat16
    x2 = x.reshape(n, total_lanes).astype(dtype)
    ea2 = (extra_agg.reshape(n, total_lanes).astype(dtype)
           if has_extra else None)
    enc_flat: list = []
    if edge_encoder_params is not None:
        fe = edge_attr.shape[-1]
        fe_pad = f // r
        raw = edge_attr.astype(dtype)
        if fe < fe_pad:
            raw = jnp.pad(raw, ((0, 0), (0, 0), (0, fe_pad - fe)))
        e2 = raw.reshape(g_blocks * emax, total_lanes // r)
        enc_flat, _ = _flatten_encoder(
            edge_encoder_params, r, f, dtype, layer_norm)
    else:
        e2 = edge_attr.reshape(g_blocks * emax, total_lanes).astype(dtype)

    ew_flat, _ = _flatten_mlp(edge_params, 3, bg, dtype, layer_norm)
    nw_flat, _ = _flatten_mlp(node_params, 2, bg, dtype, layer_norm)
    n_enc = len(enc_flat)
    n_ew = len(ew_flat)

    # [G, 1, Emax]: trailing dims match the block exactly (Mosaic tiling rule)
    if tiling_idx is not None:
        win_in, sidx_in, ridx_in = tiling_idx
        assert sidx_in.shape == (g_blocks, emax), (sidx_in.shape, g_blocks, emax)
        win_start = jnp.asarray(win_in, jnp.int32)
        sidx = jnp.asarray(sidx_in, jnp.int32)[:, None, :]
        ridx = jnp.asarray(ridx_in, jnp.int32)[:, None, :]
    else:
        sidx = jnp.asarray(tiling.sidx)[:, None, :]
        ridx = jnp.asarray(tiling.ridx)[:, None, :]
        win_start = jnp.asarray(tiling.win_start)
    # per-bucket runtime index slices. win_start rows hold each group's
    # window UNITS ([G, wb], arbitrary units; padding slots inert via the
    # sidx sentinel) — the dxw reduction epilogue scatter-adds whole
    # [wu, lanes] blocks keyed by these unit ids. The single-bucket
    # default passes the arrays through unsliced so the traced program
    # (and the compile cache) is unchanged.
    b_idx = []
    for (lo, hi, wb_b) in buckets:
        if (lo, hi, wb_b) == (0, g_blocks, wb):
            b_idx.append((win_start, sidx, ridx))
        else:
            b_idx.append((win_start[lo:hi, :wb_b], sidx[lo:hi], ridx[lo:hi]))

    # PrefetchScalarGridSpec index maps receive (c, g, win_start_ref)
    def _vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def _const_spec(w):
        nd = len(w.shape)
        return _vspec(w.shape, partial(lambda nd_, c, g, ws: (0,) * nd_, nd))

    def _off_map(lo):
        """Group-block index map with a static bucket offset (plain map
        when lo == 0 so the default path's jaxpr is unchanged)."""
        if lo == 0:
            return lambda c, g, ws: (g, c)
        return partial(lambda lo_, c, g, ws: (g + lo_, c), lo)

    def _specs(l, lo, ng, wb_b):
        """(grid, in_specs, node_spec, edge_spec, dxw_spec) for lane width
        ``l`` and the bucket covering groups [lo, lo+ng) at window width
        ``wb_b``. Node/edge arrays stay FULL-sized (maps add the static
        group offset — no slicing copies); only the dxw output is
        bucket-local (its shape depends on wb_b)."""
        grid = (total_lanes // l, ng)
        group_spec = _vspec((1, 1, emax), lambda c, g, ws: (g, 0, 0))
        node_spec = _vspec((nb, l), _off_map(lo))
        edge_spec = _vspec((emax, l), _off_map(lo))
        # raw (folded-encoder) edge blocks carry l/r lanes per chunk
        edge_in_spec = _vspec((emax, l // r), _off_map(lo))
        win_specs = [
            _vspec((wu, l), partial(lambda k, c, g, ws: (ws[g, k], c), k))
            for k in range(wb_b)
        ]
        weight_specs = [_const_spec(w) for w in enc_flat + ew_flat + nw_flat]
        extra_specs = [node_spec] if has_extra else []
        in_specs = ([group_spec, group_spec, node_spec] + win_specs
                    + [edge_in_spec] + extra_specs + weight_specs)
        dxw_spec = _vspec((wb_b * wu, l), lambda c, g, ws: (g, c))
        return grid, in_specs, node_spec, edge_spec, dxw_spec

    # aliased prev-bucket outputs ride as extra inputs with a tiny
    # constant-index spec: the alias is buffer-level (XLA donation), so
    # one [*, 128] block fetch satisfies Mosaic without re-streaming the
    # array the kernel never reads
    prev_node_spec = _vspec((nb, LANES), lambda c, g, ws: (0, 0))
    prev_edge_spec = _vspec((emax, LANES), lambda c, g, ws: (0, 0))

    def _fwd(x2, e2, ea2, weights):
        xout = eout = None
        for bi, (lo, hi, wb_b) in enumerate(buckets):
            l, _lb = lane_plan[bi]
            ng = hi - lo
            win_b, sidx_b, ridx_b = b_idx[bi]
            grid, in_specs, node_spec, edge_spec, _ = _specs(l, lo, ng, wb_b)
            extra_ops = [ea2] if has_extra else []
            out_specs = [node_spec]
            out_shape = [jax.ShapeDtypeStruct((n, total_lanes), dtype)]
            if not last_block:
                out_specs.append(edge_spec)
                out_shape.append(
                    jax.ShapeDtypeStruct((g_blocks * emax, total_lanes), dtype)
                )
            n_reg = 4 + wb_b + 1 + len(extra_ops) + len(weights)
            prev_ops, prev_specs, aliases = [], [], {}
            if bi > 0:
                # later buckets write their group ranges into the previous
                # call's output buffers; untouched blocks pass through
                prev_ops.append(xout)
                prev_specs.append(prev_node_spec)
                aliases[n_reg] = 0
                if not last_block:
                    prev_ops.append(eout)
                    prev_specs.append(prev_edge_spec)
                    aliases[n_reg + 1] = 1
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs + prev_specs,
                out_specs=out_specs,
            )
            kernel = partial(_fwd_kernel, cfg, wb_b, wu, nb, emax, l)
            if prev_ops:
                kernel = partial(_drop_refs, kernel, n_reg, len(prev_ops))
            outs = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                # no cross-step state in the forward: let Mosaic pipeline
                # the grid freely (the backward accumulates dw across
                # steps and must stay sequential)
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=VMEM_LIMIT_BYTES,
                ),
                interpret=interpret,
                input_output_aliases=aliases,
            )(win_b, sidx_b, ridx_b, x2, *([x2] * wb_b), e2, *extra_ops,
              *weights, *prev_ops)
            xout = outs[0]
            if not last_block:
                eout = outs[1]
        if last_block:
            return xout, e2  # dead edge output: hand back the input
        return xout, eout

    @jax.custom_vjp
    def run(x2, e2, *rest):
        ea2_, weights = (rest[0], rest[1:]) if has_extra else (None, rest)
        return _fwd(x2, e2, ea2_, weights)

    def run_fwd(x2, e2, *rest):
        out = run(x2, e2, *rest)
        return out, (x2, e2, rest)

    def run_bwd(res, g):
        x2, e2, rest = res
        ea2_, weights = (rest[0], rest[1:]) if has_extra else (None, rest)
        g_xout, g_eout = g
        g_xout = g_xout.astype(dtype)

        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in weights]
        dx_main = de = dx_extra = dea = None
        dws_acc = None
        for bi, (lo, hi, wb_b) in enumerate(buckets):
            _l, lb = lane_plan[bi]
            ng = hi - lo
            win_b, sidx_b, ridx_b = b_idx[bi]
            grid, in_specs, node_spec, edge_spec, dxw_spec = _specs(
                lb, lo, ng, wb_b)
            extra_ops = [ea2_] if has_extra else []
            cot_specs = [node_spec]  # g_xout
            cots = [g_xout]
            if not last_block:
                cot_specs.append(edge_spec)
                cots.append(g_eout.astype(dtype))
            out_specs = [node_spec, dxw_spec]
            out_shape = [
                jax.ShapeDtypeStruct((n, total_lanes), dtype),
                jax.ShapeDtypeStruct((ng * wb_b * wu, total_lanes), dtype),
            ]
            if has_extra:  # dea — node-aligned extra-aggregate cotangent
                out_specs.append(node_spec)
                out_shape.append(
                    jax.ShapeDtypeStruct((n, total_lanes), dtype))
            de_pos = len(out_specs)
            if n_enc == 0:
                out_specs.append(edge_spec)  # de
                out_shape.append(
                    jax.ShapeDtypeStruct((g_blocks * emax, total_lanes),
                                         dtype)
                )
            n_reg = (4 + wb_b + 1 + len(extra_ops) + len(weights)
                     + len(cots))
            prev_ops, prev_specs, aliases = [], [], {}
            if bi > 0:
                # later buckets write their group rows into the previous
                # call's full-size output buffers (node-spec'd outputs
                # cover only [lo, hi) rows per bucket)
                prev_ops.append(dx_main)
                prev_specs.append(prev_node_spec)
                aliases[n_reg] = 0
                if has_extra:
                    prev_ops.append(dea)
                    prev_specs.append(prev_node_spec)
                    aliases[n_reg + len(prev_ops) - 1] = 2
                if n_enc == 0:
                    prev_ops.append(de)
                    prev_specs.append(prev_edge_spec)
                    aliases[n_reg + len(prev_ops) - 1] = de_pos
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs + cot_specs + prev_specs,
                out_specs=out_specs + [_const_spec(s) for s in dw_shapes],
                scratch_shapes=[pltpu.VMEM(s.shape, jnp.float32)
                                for s in dw_shapes],
            )
            kernel = partial(_bwd_kernel, cfg, wb_b, wu, nb, emax, lb)
            if prev_ops:
                kernel = partial(_drop_refs, kernel, n_reg, len(prev_ops))
            outs = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape + dw_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=VMEM_LIMIT_BYTES,
                ),
                interpret=interpret,
                input_output_aliases=aliases,
            )(win_b, sidx_b, ridx_b, x2, *([x2] * wb_b), e2, *extra_ops,
              *weights, *cots, *prev_ops)
            dx_main, dxw = outs[0], outs[1]
            outs = outs[2:]
            if has_extra:
                dea = outs[0]
                outs = outs[1:]
            if n_enc == 0:
                de = outs[0]
                dws = outs[1:]
            else:
                dws = outs
            # per-bucket weight grads sum (tiny arrays)
            dws_acc = (list(dws) if dws_acc is None
                       else [a + d for a, d in zip(dws_acc, dws)])
            # block-granular scatter-add of this bucket's window
            # contributions (its own wb_b width and unit-id list)
            dxw_blocks = dxw.reshape(ng * wb_b, wu, total_lanes)
            contrib = jax.ops.segment_sum(
                dxw_blocks, win_b.reshape(-1).astype(jnp.int32),
                num_segments=n // wu,
            )
            dx_extra = contrib if dx_extra is None else dx_extra + contrib
        if n_enc != 0:
            de = jnp.zeros_like(e2)  # raw features carry no gradient
        # fp32 in-kernel accumulators -> cotangent dtype must match primal
        dws = [dw.astype(w.dtype) for dw, w in zip(dws_acc, weights)]
        dx = (dx_main.astype(jnp.float32)
              + dx_extra.reshape(n, total_lanes).astype(jnp.float32))
        if has_extra:
            return (dx.astype(dtype), de, dea, *dws)
        return (dx.astype(dtype), de, *dws)

    run.defvjp(run_fwd, run_bwd)

    extra_in = (ea2,) if has_extra else ()
    xout2, eout2 = run(x2, e2, *extra_in, *enc_flat, *ew_flat, *nw_flat)
    xout = xout2.reshape(n, b, f)
    if last_block:
        return xout, edge_attr  # dead edge stream, unchanged
    return xout, eout2.reshape(g_blocks * emax, b, f)


# ----------------------------------------------------------------------
# pure-JAX reference of the same blocked semantics (tests)
# ----------------------------------------------------------------------

def blocked_reference(x, edge_attr, edge_params, node_params, tiling,
                      activation="relu", layer_norm=True,
                      compute_dtype=jnp.float32, extra_agg=None):
    """XLA implementation of exactly the fused math, for parity tests.

    With ``compute_dtype=jnp.bfloat16`` the dtype flow mirrors the kernel
    (bf16 matmul operands, fp32 accumulation/statistics), so fused-vs-
    reference comparisons isolate logic bugs from precision noise.
    """
    n, b, f = x.shape
    act = _act(activation)
    cd = compute_dtype
    is_bf = cd == jnp.bfloat16

    def dense_f32(h, k):
        # fp32-accumulating matmul on cd operands
        return jax.lax.dot_general(
            h.astype(cd), k.astype(cd),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dense(h, k):
        out = dense_f32(h, k)
        return out.astype(cd) if is_bf else out

    def mlp(parts, params, extra_h0=()):
        """``extra_h0``: pre-dotted first-layer contributions (already in
        cd — mirrors the kernel's gather-after-pre-dot order, where the
        xr/xs partials round to bf16 before the h0 sum)."""
        n_dense = len([k for k in params if k.startswith("Dense_")])
        k0 = params["Dense_0"]["kernel"]
        splits = np.cumsum([p.shape[-1] for p in parts])
        k0_parts = jnp.split(k0, splits, axis=0)  # leftover rows → extras
        # first-layer raw parts summed in fp32 BEFORE the cd cast
        h = sum(dense_f32(p, kp) for p, kp in zip(parts, k0_parts))
        for ex in extra_h0:
            h = h + ex.astype(jnp.float32)
        if is_bf:
            h = h.astype(cd)
        h = h + params["Dense_0"]["bias"].astype(h.dtype)
        for i in range(1, n_dense):
            h = dense(act(h), params[f"Dense_{i}"]["kernel"])
            h = h + params[f"Dense_{i}"]["bias"].astype(h.dtype)
        if layer_norm:
            s = params["RMSNorm_0"]["scale"]
            gs = jnp.sum((h * h).astype(jnp.float32), -1, keepdims=True)
            r = jnp.sqrt(gs + 1e-24) / math.sqrt(f)
            inv = 1.0 / (r + 1e-8)
            h = h * inv.astype(h.dtype) * s.astype(h.dtype)
        return h

    g_blocks, emax = tiling.sidx.shape
    sid = jnp.asarray(tiling.sidx).reshape(-1)
    rid = jnp.asarray(tiling.ridx).reshape(-1)
    gids = jnp.repeat(jnp.arange(g_blocks), emax)
    wu_ = tiling.window_unit
    rank = jnp.minimum(sid // wu_, tiling.window_blocks - 1)
    glob_s = (jnp.asarray(tiling.win_start)[gids, rank] * wu_ + sid % wu_)
    glob_r = gids * tiling.node_block + rid
    s_valid = sid < tiling.window_rows
    r_valid = rid < tiling.node_block
    xc = x.astype(cd)
    ec = edge_attr.astype(cd)
    # gather-after-pre-dot, mirroring the kernel (_predot_gather): the
    # x@Kr / x@Ks partials are computed per NODE, rounded to cd, and THEN
    # gathered to edge rows
    ek0 = edge_params["Dense_0"]["kernel"]
    f_e = ec.shape[-1]
    x_kr = dense(xc, ek0[f_e : f_e + f])
    x_ks = dense(xc, ek0[f_e + f :])
    hs = jnp.where(s_valid[:, None, None],
                   x_ks[jnp.clip(glob_s, 0, n - 1)], jnp.zeros((), x_ks.dtype))
    hr = jnp.where(r_valid[:, None, None],
                   x_kr[jnp.clip(glob_r, 0, n - 1)], jnp.zeros((), x_kr.dtype))
    eh = mlp([ec], edge_params, extra_h0=(hr, hs))
    agg = jax.ops.segment_sum(
        jnp.where(r_valid[:, None, None], eh.astype(jnp.float32), 0.0),
        jnp.clip(glob_r, 0, n - 1), num_segments=n).astype(cd)
    if extra_agg is not None:
        agg = agg + extra_agg.astype(cd)
    nh = mlp([xc, agg], node_params)
    return (xc + nh).astype(x.dtype), (ec + eh).astype(edge_attr.dtype)
