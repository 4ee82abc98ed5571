"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native substitute for "testing multi-node without a cluster":
sharding/collective code paths compile and execute against 8 host-platform
devices, so pjit/psum logic is exercised for real in CI.
"""
import os

# HARD override: the environment ships JAX_PLATFORMS=axon (remote TPU via a
# tunnel) — tests must run on the local virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# persistent compile cache: amortizes XLA compiles across test runs (the CI
# box has a single slow core; eager per-op compiles are the enemy)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def jit_init(model, rngs, *args, **kwargs):
    """model.init under jit: one XLA compile instead of one per eager op."""
    import functools

    return jax.jit(functools.partial(model.init, **kwargs))(rngs, *args)
