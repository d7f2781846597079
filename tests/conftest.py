"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on faked host devices (SURVEY.md §4's recommended strategy).
Must set env vars before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

# Persistent jit cache: the suite is compile-dominated on the CPU mesh, and
# the programs are identical across runs — cache them next to the repo.
# Set via jax.config (NOT the env var): the axon sitecustomize imports jax
# at interpreter startup, long before this file, so env vars are ignored.
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                               ".jax_cache_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# The axon sitecustomize force-registers the TPU platform regardless of env;
# override explicitly so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
