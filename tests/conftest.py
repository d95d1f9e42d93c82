"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and registers the axon TPU
backend in every interpreter, so plain env vars are read too late. We instead
update jax.config before any backend is initialized: tests run on an 8-device
virtual CPU platform, exercising the same jit/shard_map code paths as TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound per-process XLA:CPU compiler-state accumulation (the round-1
    full-suite segfault): drop compiled executables after each test module.
    Shapes rarely repeat across modules, so the recompile cost is small."""
    yield
    jax.clear_caches()
