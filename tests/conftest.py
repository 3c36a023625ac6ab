"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is imported,
so multi-chip sharding tests (mesh/pjit/shard_map) run anywhere — the pattern
the driver also uses for the multi-chip dry run.
"""

import os

# The environment presets JAX_PLATFORMS=axon (the real TPU tunnel); tests must
# run on a virtual 8-device CPU mesh, so force it hard (env var alone is not
# honored once the axon plugin registers — jax.config.update below is).
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def eight_device_mesh():
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    assert len(devices) >= 8, f"expected 8 virtual devices, got {len(devices)}"
    return Mesh(np.array(devices[:8]), ("data",))
