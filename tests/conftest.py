"""Test harness: run everything on a virtual 8-device CPU mesh.

(SURVEY.md §4: the JAX-native replacement for fake NCCL backends.)

Note: env vars alone are NOT enough here — installed pytest plugins
(jaxtyping) import jax before this conftest runs, which snapshots
JAX_PLATFORMS too early and would silently route test compiles through
the axon TPU tunnel. ``jax.config.update`` works post-import.
"""

import os

# FORCE (not setdefault): some shells in this image export
# JAX_PLATFORMS=axon; the CLIs honor the env var (cli/train.py
# _honor_platform_env), so leaving 'axon' here would flip e2e CLI tests —
# and every test after them — onto the real TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
