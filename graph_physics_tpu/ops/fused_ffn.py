"""Fused Pallas gated-FFN — the transformer block's second hot kernel.

The reference transformer block (graphphysics/models/layers.py:700-819)
is ``x += attn(norm1(x)); x += gated_mlp(norm2(x))``. Round 2 fused the
attention (ops/fused_edge_attention.py, 3.7x); the FFN half still ran as
~7 separate XLA kernels (RMSNorm, two width-3H projections, act, gate
multiply, out projection, residual), each round-tripping the [N, B·H]
activations — and the 3H-wide intermediates — through HBM in fwd AND bwd.

This kernel runs the whole FFN in VMEM per (row-block, lane-chunk):

    y = x + W3 · (act(W1·rms(x)+b1) ⊙ (W2·rms(x)+b2)) + b3

with the same kron block-diagonal weight packing as ops/fused_gnblock
(per-sample [H, ·] weights expanded to [128, bg·] so every projection is
one full-lane-width MXU matmul even at hidden 64). Rectangular layers are
fine: rows stay [·, 128], the wide intermediate is a [·, bg·3H] 2-D tile.

Backward is a second kernel (custom VJP): rematerializes from x (node
rows only — cheap), accumulates weight grads in fp32 VMEM across grid
steps. HBM traffic per pass collapses to one read of x + one write of y.

Numerics match models/layers.GatedMLPBlock with dtype=bf16 (fp32 dot
accumulation and RMS statistics, bf16 activation flow).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_physics_tpu.ops.fused_gnblock import (
    LANES,
    _act,
    _act_grad,
    _dot,
    _dot_bt,
    _dot_t,
    _group_ones,
    _rms_bwd,
    _rms_fwd,
    _tile_vec,
)


@dataclass(frozen=True)
class FFNConfig:
    h: int  # hidden size (per sample)
    wide: int  # expansion width per sample (reference: 3*h)
    activation: str = "gelu"
    rms_eps: float = 1e-8
    #: apply the transformer block's norm2 BEFORE the FFN's internal
    #: RMSNorm (y = x + FFN_block(norm2(x)), layers.py TransformerBlock)
    pre_norm: bool = False


def _kron_rect(w: jnp.ndarray, bg: int, dtype) -> jnp.ndarray:
    """[A, B] -> block-diagonal [bg*A, bg*B] (differentiable)."""
    if bg == 1:
        return w.astype(dtype)
    a, b = w.shape
    eye = jnp.eye(bg, dtype=dtype)
    return jnp.einsum("xy,ij->xiyj", eye, w.astype(dtype)).reshape(
        bg * a, bg * b
    )


def _ffn_fwd_kernel(cfg: FFNConfig, nb, lanes, x_ref, *refs):
    if cfg.pre_norm:
        scale2_ref = refs[0]
        refs = refs[1:]
    (scale_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
     out_ref) = refs
    k = lanes // LANES
    act = _act(cfg.activation)
    ones_h = _group_ones(cfg.h)
    xr = x_ref[:]  # [nb, lanes] bf16
    rows = xr.reshape(nb * k, LANES)
    if cfg.pre_norm:
        rows, _u0, _inv0 = _rms_fwd(rows, ones_h, scale2_ref[:], cfg.h,
                                    cfg.rms_eps)
    hnorm, _u, _inv = _rms_fwd(rows, ones_h, scale_ref[:], cfg.h, cfg.rms_eps)
    a1 = _dot(hnorm, w1_ref[:]).astype(jnp.bfloat16) + b1_ref[:].astype(
        jnp.bfloat16)
    a2 = _dot(hnorm, w2_ref[:]).astype(jnp.bfloat16) + b2_ref[:].astype(
        jnp.bfloat16)
    gmid = (act(a1) * a2).astype(jnp.bfloat16)
    out = _dot(gmid, w3_ref[:]).astype(jnp.bfloat16) + b3_ref[:].astype(
        jnp.bfloat16)
    out_ref[:] = xr + out.reshape(nb, lanes)


def _ffn_bwd_kernel(cfg: FFNConfig, nb, lanes, x_ref, *refs):
    if cfg.pre_norm:
        scale2_ref = refs[0]
        refs = refs[1:]
    (scale_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
     g_ref, dx_ref) = refs[:9]
    refs = refs[9:]
    if cfg.pre_norm:
        dscale2_ref = refs[0]
        refs = refs[1:]
    (dscale_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
     db3_ref) = refs
    k = lanes // LANES
    act = _act(cfg.activation)
    ones_h = _group_ones(cfg.h)
    xr = x_ref[:]
    rows = xr.reshape(nb * k, LANES)
    if cfg.pre_norm:
        t, u0, inv0 = _rms_fwd(rows, ones_h, scale2_ref[:], cfg.h,
                               cfg.rms_eps)
    else:
        t = rows
    hnorm, u, inv = _rms_fwd(t, ones_h, scale_ref[:], cfg.h, cfg.rms_eps)
    a1 = _dot(hnorm, w1_ref[:]).astype(jnp.bfloat16) + b1_ref[:].astype(
        jnp.bfloat16)
    a2 = _dot(hnorm, w2_ref[:]).astype(jnp.bfloat16) + b2_ref[:].astype(
        jnp.bfloat16)
    act1 = act(a1).astype(jnp.bfloat16)
    gmid = (act1 * a2).astype(jnp.bfloat16)

    g_out = g_ref[:]  # [nb, lanes] bf16
    g = g_out.reshape(nb * k, LANES)

    db3 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dw3 = _dot_t(gmid, g)
    g_mid = _dot_bt(g, w3_ref[:]).astype(jnp.bfloat16)  # [rows, bg*wide]
    ga1 = (g_mid * a2 * _act_grad(cfg.activation, a1)).astype(jnp.bfloat16)
    ga2 = (g_mid * act1).astype(jnp.bfloat16)
    db1 = jnp.sum(ga1.astype(jnp.float32), axis=0, keepdims=True)
    db2 = jnp.sum(ga2.astype(jnp.float32), axis=0, keepdims=True)
    dw1 = _dot_t(hnorm, ga1)
    dw2 = _dot_t(hnorm, ga2)
    g_h = (_dot_bt(ga1, w1_ref[:]) + _dot_bt(ga2, w2_ref[:])).astype(
        jnp.bfloat16)
    g_in, dscale = _rms_bwd(g_h, t, u, inv, scale_ref[:], ones_h, cfg.h,
                            cfg.rms_eps)
    accum = []
    if cfg.pre_norm:
        g_in, dscale2 = _rms_bwd(g_in, rows, u0, inv0, scale2_ref[:],
                                 ones_h, cfg.h, cfg.rms_eps)
        accum.append((dscale2_ref, dscale2))
    dx_ref[:] = g_out + g_in.reshape(nb, lanes)

    is_first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for ref, val in accum + [
        (dscale_ref, dscale), (dw1_ref, dw1), (db1_ref, db1),
        (dw2_ref, dw2), (db2_ref, db2), (dw3_ref, dw3), (db3_ref, db3),
    ]:

        @pl.when(is_first)
        def _(ref=ref):
            ref[:] = jnp.zeros_like(ref)

        ref[:] += val.astype(jnp.float32)


def fused_gated_ffn(
    x: jnp.ndarray,  # [N, B, H] packed
    params: dict,  # GatedMLPBlock flax params
    activation: str = "gelu",
    interpret: bool = False,
    lanes: int = 512,
    lanes_bwd: int = 256,
    norm2_scale: Optional[jnp.ndarray] = None,  # TransformerBlock's norm2
) -> jnp.ndarray:
    """x + GatedMLPBlock(x) as one fused kernel pair (fwd + custom VJP).

    ``params``: {'RMSNorm_0': {scale}, 'GatedMLP_0': {'Dense_0': W1/b1,
    'Dense_1': W2/b2}, 'Dense_0': W3/b3} — the exact pytree
    models/layers.GatedMLPBlock materializes. Spec: reference
    build_gated_mlp + Transformer FFN half (layers.py:213-278, 700-819).
    """
    n, b, h = x.shape
    assert LANES % h == 0, f"hidden {h} must divide {LANES}"
    bg = LANES // h
    total_lanes = b * h
    assert total_lanes % LANES == 0

    w1 = params["GatedMLP_0"]["Dense_0"]["kernel"]
    wide = w1.shape[1]
    cfg = FFNConfig(h=h, wide=wide, activation=activation,
                    pre_norm=norm2_scale is not None)
    dtype = jnp.bfloat16

    def _fit(l):
        l = max(min(l, total_lanes), LANES)
        while total_lanes % l != 0:
            l -= LANES
        return l

    lanes = _fit(lanes)
    lanes_bwd = _fit(lanes_bwd)
    nb = 256 if n % 256 == 0 else 128
    assert n % nb == 0, f"node count {n} must be a multiple of {nb}"

    x2 = x.reshape(n, total_lanes).astype(dtype)

    def _pack(p):
        return [
            _tile_vec(p["RMSNorm_0"]["scale"].astype(jnp.float32), bg),
            _kron_rect(p["GatedMLP_0"]["Dense_0"]["kernel"], bg, dtype),
            _tile_vec(p["GatedMLP_0"]["Dense_0"]["bias"].astype(jnp.float32),
                      bg),
            _kron_rect(p["GatedMLP_0"]["Dense_1"]["kernel"], bg, dtype),
            _tile_vec(p["GatedMLP_0"]["Dense_1"]["bias"].astype(jnp.float32),
                      bg),
            _kron_rect(p["Dense_0"]["kernel"], bg, dtype),
            _tile_vec(p["Dense_0"]["bias"].astype(jnp.float32), bg),
        ]

    weights = _pack(params)
    if norm2_scale is not None:
        weights = [_tile_vec(norm2_scale.astype(jnp.float32), bg)] + weights

    def _specs(l):
        grid = (n // nb, total_lanes // l)
        node_spec = pl.BlockSpec((nb, l), lambda r, c: (r, c),
                                 memory_space=pltpu.VMEM)
        w_specs = [
            pl.BlockSpec(w.shape, partial(lambda nd, r, c: (0,) * nd,
                                          len(w.shape)),
                         memory_space=pltpu.VMEM)
            for w in weights
        ]
        return grid, node_spec, w_specs

    def _fwd(x2, *weights):
        grid, node_spec, w_specs = _specs(lanes)
        kernel = partial(_ffn_fwd_kernel, cfg, nb, lanes)
        (out,) = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[node_spec] + w_specs,
            out_specs=[node_spec],
            out_shape=[jax.ShapeDtypeStruct((n, total_lanes), dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(x2, *weights)
        return out

    @jax.custom_vjp
    def run(x2, *weights):
        return _fwd(x2, *weights)

    def run_fwd(x2, *weights):
        return run(x2, *weights), (x2, weights)

    def run_bwd(res, g_out):
        x2, weights = res
        grid, node_spec, w_specs = _specs(lanes_bwd)
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in weights]
        kernel = partial(_ffn_bwd_kernel, cfg, nb, lanes_bwd)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[node_spec] + w_specs + [node_spec],
            out_specs=[node_spec] + w_specs,
            out_shape=[jax.ShapeDtypeStruct((n, total_lanes), dtype)]
            + dw_shapes,
            interpret=interpret,
        )(x2, *weights, g_out.astype(dtype))
        dx = outs[0]
        dws = [dw.astype(w.dtype) for dw, w in zip(outs[1:], weights)]
        return (dx, *dws)

    run.defvjp(run_fwd, run_bwd)
    y2 = run(x2, *weights)
    return y2.reshape(n, b, h).astype(x.dtype)


def gated_ffn_reference(x, params, activation="gelu"):
    """XLA mirror of the fused math (tests): x + W3(act(W1 n)+b1 ⊙ ...)."""
    from graph_physics_tpu.models.layers import GatedMLPBlock

    h = x.shape[-1]
    mod = GatedMLPBlock(in_size=h, hidden_size=h, out_size=h,
                        dtype=jnp.bfloat16)
    return x + mod.apply({"params": params}, x)
