"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is imported,
so multi-chip sharding tests (mesh/pjit/shard_map) run anywhere — the pattern
the driver also uses for the multi-chip dry run.
"""

import os

# The environment presets JAX_PLATFORMS=axon (the real TPU tunnel); tests must
# run on a virtual 8-device CPU mesh, so force it hard. CAUTION: a pytest
# plugin imports jax BEFORE this conftest runs, so env vars set here are
# already bound — ONLY jax.config.update takes effect (for the platform AND
# for the compilation cache; the env-var-only cache setup silently never
# wrote a single entry).
os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Interpret-mode kernel tests are TRACE/COMPILE-bound: the fused kernels
# unroll t_chunk steps into the jaxpr, so t_chunk 4 (vs the TPU-tuned
# default 8) roughly halves every pallas test's trace+compile cost while
# exercising MORE chunk-boundary transitions. Production defaults are
# untouched (this is the test harness only); respect an explicit override.
os.environ.setdefault("EEGFLOW_FUSED_TC", "4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: interpret-mode Pallas backward graphs take
# 30-120 s each to compile on CPU; warm runs skip all of it.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
