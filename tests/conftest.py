"""Test bootstrap: force an 8-device virtual CPU platform BEFORE jax import
so multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication (c))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the container pre-imports jax via sitecustomize (axon TPU plugin), so the
# env var alone is too late — force the platform through the live config too
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: XLA-CPU compiles of the test models dominate
# suite runtime; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from tpupose.parallel.mesh import create_mesh

    return create_mesh(data=-1, model=1)
