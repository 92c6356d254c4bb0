"""Speed-of-light microbenchmark for the hidden-32 MXU handicap.

Measures a minimal Pallas kernel that is NOTHING BUT the fused kernels'
inner loop — a chain of ``[rows, 128] @ [128, 128]`` fp32-accumulating
bf16 matmuls over streamed row blocks — and compares the achieved
issue rate against what the bench kernels achieve end-to-end.

Two findings this documents (BASELINE.md round-3 gap accounting):
  1. the chain runs at the SAME wall time whether the [128, 128] weights
     are dense or kron block-diagonal (I_4 ⊗ W_32): the systolic array
     does not skip structural zeros, so hidden-32 models pay 4x per
     USEFUL flop by construction;
  2. the achieved issued-TFLOP/s of this DMA-streamed chain is the
     practical ceiling for the real kernels (which add gathers, RMS
     statistics and elementwise ops on top);
  3. interleaving two INDEPENDENT half-row chains (run_ilp) does NOT
     lift the rate (measured 86.8 vs 84-89 TFLOP/s) — the ~90 TF/s
     ceiling is not dependency fill/drain serialization, so a kernel
     ILP restructure has no headroom to recover.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

ROWS_BLK = 1536  # ~= the bwd kernel's edge-rows view per grid step
LANES = 128
CHAIN = 12  # dense-equivalents per grid step (≈ the bwd kernel's count)
N_BLOCKS = 240  # grid steps per call (≈ bwd grid of one MP block)


def _kernel(n_chain, x_ref, *refs):
    w_refs = refs[:n_chain]
    out_ref = refs[n_chain]
    h = x_ref[:]
    for w in w_refs:
        h = jax.lax.dot_general(
            h, w[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    out_ref[:] = h


# Dead end (measured 2026-08-17): a bf16-OUTPUT chain
# (preferred_element_type=bf16, hoping to elide the post-dot convert
# passes) does not lower — Mosaic verification error "'tpu.matmul' op
# Expected matmul acc to be 32-bit". The fp32-accumulate + explicit
# .astype(bf16) flow below is the only legal form, so the converts are
# structural and the ~90 TF/s chain ceiling stands.


def run(weights, name, kernel_fn=None):
    kernel_fn = kernel_fn or _kernel
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(N_BLOCKS * ROWS_BLK, LANES)),
        jnp.bfloat16,
    )
    w_specs = [
        pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                     memory_space=pltpu.VMEM)
        for _ in weights
    ]
    f = pl.pallas_call(
        partial(kernel_fn, len(weights)),
        grid=(N_BLOCKS,),
        in_specs=[pl.BlockSpec((ROWS_BLK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((ROWS_BLK, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )
    inner = 50  # amortize the tunnel's per-dispatch latency (memory: host
    # timings of single small dispatches are RTT, not device time)

    @jax.jit
    def many(x):
        def body(h, _):
            return f(h, *weights), None

        out, _ = jax.lax.scan(body, x, None, length=inner)
        return out

    out = many(x)
    _ = np.asarray(out[0, 0])
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        out = many(x)
        _ = np.asarray(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    best /= inner
    issued = 2 * N_BLOCKS * ROWS_BLK * LANES * LANES * len(weights)
    print(f"{name}: {best*1e3:.3f} ms/call  issued {issued/best/1e12:.1f} "
          "TFLOP/s")
    return best


def main():
    rng = np.random.default_rng(1)
    dense = [jnp.asarray(rng.normal(size=(LANES, LANES)), jnp.bfloat16)
             for _ in range(CHAIN)]
    w32 = [rng.normal(size=(32, 32)) for _ in range(CHAIN)]
    blockdiag = [
        jnp.asarray(np.kron(np.eye(4), w), jnp.bfloat16) for w in w32
    ]
    t_dense = run(dense, "dense [128,128] chain")
    t_bd = run(blockdiag, "block-diag I4⊗[32,32] chain (the kron packing)")
    run(dense, "2-way-ILP interleaved half-row chains", kernel_fn=_kernel_ilp)
    print(f"dense/block-diag wall-time ratio: {t_dense / t_bd:.3f} "
          "(1.0 ⇒ the MXU does not skip structural zeros; useful-flop "
          "rate at hidden 32 is 1/4 of issued)")


def _kernel_ilp(n_chain, x_ref, *refs):
    """Same flops, TWO independent half-row chains interleaved: measures
    how much of the chain's fill/drain serialization ILP can recover."""
    w_refs = refs[:n_chain]
    out_ref = refs[n_chain]
    h1 = x_ref[: ROWS_BLK // 2]
    h2 = x_ref[ROWS_BLK // 2 :]
    for w in w_refs:
        wv = w[:]
        h1 = jax.lax.dot_general(
            h1, wv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h2 = jax.lax.dot_general(
            h2, wv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out_ref[: ROWS_BLK // 2] = h1
    out_ref[ROWS_BLK // 2 :] = h2


if __name__ == "__main__":
    main()
