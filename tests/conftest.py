"""Test environment: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in this environment; multi-chip sharding is
validated on host-platform virtual devices (SURVEY.md §4 test strategy (c)).
Must run before jax is imported anywhere.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: this environment ships an 'axon' TPU plugin that overrides the
# JAX_PLATFORMS env var; only a post-import config update reliably selects
# the host platform.  Must happen before any backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/kspec_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)
