"""Fused in-kernel gumbel perturbation for Transolver slice logits.

The reference perturbs slice logits with gumbel noise during training
(reference transolver.py:19-33: ``y + (-log(-log(U + eps) + eps))``,
U ~ Uniform[0,1)). Threading that draw through XLA cost the transolver
step ~30% (BASELINE.md round 4: 7,227 -> 5,030 g/s with the rbg
generator; threefry was 4,592): per block it generates an [N, H, G]
fp32 uniform tensor in one kernel, writes it to HBM, then reads it back
for the double-log + add.

This kernel moves the whole draw on-chip (``pltpu.prng_random_bits``):
bits are generated in VMEM, converted to U[0,1) by the mantissa
bit-trick (1.0 <= 1.f|mantissa < 2.0, minus 1 — the same 24-bit
resolution class as ``jax.random.uniform``), double-logged and added to
the logits in ONE pass — no HBM noise tensor, no separate RNG dispatch.
Same N(gumbel) distribution as the XLA path, different (but proper,
per-core hardware PRNG) generator — the same equivalence class as the
round-4 threefry->rbg switch.

Stream independence: every [ROWS, H*G] grid block consumes its own
(seed0, seed1) pair from a tiny per-call seed ARRAY derived from the
caller's PRNG key (8 threefry words per ~2k rows — negligible). Seeds
ride as a block-specced input rather than program_id mixing so the
kernel stays correct under vmap (vmap prepends a grid axis, which would
silently re-index ``pl.program_id``).

Gradient: the perturbation is an additive constant w.r.t. the logits,
so the VJP is an exact passthrough (no recompute, no stored residuals).

Layout contract: callers pass logits [N, H, G] with H*G a multiple of
128 (the canonical transolver shapes: 4 heads x 32 slices = exactly one
lane tile); the wrapper reshapes to [N, H*G] rows (free, contiguous)
and grids over row blocks. Shapes that don't tile fall back to the XLA
draw in the caller (models/transolver.gumbel_softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per grid step ([ROWS, H*G] f32 block in VMEM)
ROWS = 256


def _kernel(seed_ref, x_ref, o_ref):
    pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    # uniform [0,1): force exponent to 1.0's, keep 23 mantissa bits, -1
    u = pltpu.bitcast(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    ) - 1.0
    g = -jnp.log(-jnp.log(u + 1e-8) + 1e-8)
    o_ref[:] = x_ref[:].astype(jnp.float32) + g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _perturb(x2d, seeds, interpret):
    n, hg = x2d.shape
    grid = (pl.cdiv(n, ROWS),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            # [nb, 1, 2]: last-two dims match the overall array (the TPU
            # lowering's SMEM blocking constraint); leading dim = block id
            pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, hg), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS, hg), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hg), jnp.float32),
        interpret=interpret,
    )(seeds, x2d)


def _fwd(x2d, seeds, interpret):
    # zero-size dtype carrier (a bare np.dtype is not a valid residual)
    return _perturb(x2d, seeds, interpret), jnp.zeros((0,), x2d.dtype)


def _bwd(interpret, res, ct):
    # d(x + g)/dx = 1: exact passthrough (noise is additive)
    return ct.astype(res.dtype), None


_perturb.defvjp(_fwd, _bwd)


def supported(logits_shape) -> bool:
    """True when the fused kernel serves this [..., H, G] logits shape —
    TPU only: ``pltpu.prng_seed`` has no CPU/interpret lowering, so
    other backends keep the XLA draw (tests guard the kernel via AOT
    TPU lowering, tests/test_gumbel_kernel.py)."""
    hg = int(np.prod(logits_shape[-2:]))
    return hg % 128 == 0 and jax.default_backend() == "tpu"


def gumbel_perturb(logits: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """``logits + Gumbel(0,1)`` in fp32, drawn on-chip (see module doc).

    ``logits``: [N, H, G] (any float dtype). ``rng``: a jax PRNG key —
    it seeds the per-block hardware PRNG streams (generator independence
    from the XLA draw is accepted, like rbg vs threefry).
    """
    n, h, g = logits.shape
    nb = pl.cdiv(n, ROWS)
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (nb, 1, 2), jnp.uint32), jnp.int32
    )
    out = _perturb(logits.reshape(n, h * g), seeds, False)
    return out.reshape(n, h, g)
