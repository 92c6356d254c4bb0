"""Microbench: world-sidecar gather/scatter primitive candidates on TPU.

The plate fused step spends ~200 of 265 ms/step in the world-seam
gathers/scatters ([W=1024, B=64] edges against [N=1408, B=64, H=4, D=16]
node tensors, ~6 instances x 10 blocks). This isolates the primitives:

  gather variants   take_along_axis broadcast / flat row take
  scatter variants  segment_sum (flat ids) / sorted-ids segment_sum /
                    one-hot einsum (bf16 dot, chunked over W)

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache python scripts/micro_worldseam.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

N, B, H, D, W = 1408, 64, 4, 16, 1024
HD = H * D


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _i in range(30):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:8.3f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    arr = jnp.asarray(rng.normal(size=(N, B, H, D)).astype(np.float32))
    arrb = arr.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, size=(W, B)).astype(np.int32))
    idx_sorted = jnp.asarray(np.sort(np.asarray(idx), axis=0))
    vals = jnp.asarray(rng.normal(size=(W, B, H, D)).astype(np.float32))

    # -- gathers ---------------------------------------------------------
    def g_tala(a, i):
        return jnp.take_along_axis(
            a, i.reshape(W, B, 1, 1), axis=0
        )

    def g_flat(a, i):
        flat = a.reshape(N * B, H, D)
        fids = (i * B + jnp.arange(B, dtype=i.dtype)[None, :]).reshape(-1)
        return jnp.take(flat, fids, axis=0).reshape(W, B, H, D)

    def g_onehot(a, i):
        # one-hot matmul gather: out[w,b,hd] = sum_n oh[b,w,n] a[n,b,hd]
        oh = jax.nn.one_hot(i.transpose(1, 0), N, dtype=jnp.bfloat16)  # [B,W,N]
        af = a.reshape(N, B, HD).transpose(1, 0, 2).astype(jnp.bfloat16)
        out = jnp.einsum("bwn,bnf->bwf", oh, af,
                         preferred_element_type=jnp.float32)
        return out.transpose(1, 0, 2).reshape(W, B, H, D)

    timeit("gather take_along_axis", g_tala, arr, idx)
    timeit("gather flat row take", g_flat, arr, idx)
    timeit("gather one-hot bf16 einsum", g_onehot, arr, idx)

    # -- scatters --------------------------------------------------------
    def s_segsum(v, i):
        fids = (i * B + jnp.arange(B, dtype=i.dtype)[None, :]).reshape(-1)
        out = jax.ops.segment_sum(v.reshape(W * B, H, D), fids,
                                  num_segments=N * B)
        return out.reshape(N, B, H, D)

    def s_segsum_sorted(v, i):
        # b-major flatten: ids = b*N + recv (sorted when recv sorted/col)
        fids = (i.transpose(1, 0)
                + (jnp.arange(B, dtype=i.dtype) * N)[:, None]).reshape(-1)
        vb = v.transpose(1, 0, 2, 3).reshape(B * W, H, D)
        out = jax.ops.segment_sum(vb, fids, num_segments=B * N,
                                  indices_are_sorted=True)
        return out.reshape(B, N, H, D).transpose(1, 0, 2, 3)

    def s_onehot(v, i):
        oh = jax.nn.one_hot(i.transpose(1, 0), N, dtype=jnp.bfloat16)  # [B,W,N]
        vf = v.transpose(1, 0, 2, 3).reshape(B, W, HD).astype(jnp.bfloat16)
        out = jnp.einsum("bwn,bwf->bnf", oh, vf,
                         preferred_element_type=jnp.float32)
        return out.transpose(1, 0, 2).reshape(N, B, H, D)

    timeit("scatter segment_sum flat", s_segsum, vals, idx)
    timeit("scatter segment_sum sorted ids", s_segsum_sorted, vals,
           idx_sorted)
    timeit("scatter one-hot bf16 einsum", s_onehot, vals, idx)

    # segment_max (the s_w shift) vs global max
    def m_seg(v, i):
        fids = (i * B + jnp.arange(B, dtype=i.dtype)[None, :]).reshape(-1)
        return jax.ops.segment_max(v.reshape(W * B, H, D)[..., 0], fids,
                                   num_segments=N * B)

    def m_global(v, i):
        return jnp.max(v[..., 0], axis=0)

    timeit("segment_max flat", m_seg, vals, idx)
    timeit("global max over W", m_global, vals, idx)


if __name__ == "__main__":
    main()
