"""graph_physics_tpu — TPU-native learned mesh simulation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch framework (DonsetPG/graph-physics): MeshGraphNet-style
encode-process-decode models, sparse-attention graph transformers and
Transolver++ trained as autoregressive mesh simulators.

Design pillars (TPU-first, not a port):
  * Static-shape ``MeshGraph`` pytrees, padded to shape buckets so XLA
    compiles a handful of programs and keeps the MXU busy.
  * All hot compute (edge MLPs, segment scatter, edge-masked attention)
    expressed as batched GEMMs + segment ops, with Pallas kernels for the
    gather/scatter hot path.
  * One jitted train step: on-device noise injection, normalization with
    explicit running-stat state, forward, masked loss, AdamW + cosine
    warmup; data-parallel via ``jax.sharding`` over a device mesh.
  * Rollout as an on-device ``lax.scan`` over trajectory frames.
"""

__version__ = "0.1.0"
