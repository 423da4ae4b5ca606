"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU via
--xla_force_host_platform_device_count (SURVEY.md §4 implication); the
driver separately compile-checks the real multi-chip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env pre-sets 'axon'; tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: the persistent compilation cache is DISABLED for tests: XLA:CPU
# executable (de)serialisation segfaults on one of the suite's programs
# (jax 0.9, compilation_cache.get/put_executable_and_time), killing the
# run. In-process jit caching is unaffected.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax BEFORE this conftest, so jax has
# already captured JAX_PLATFORMS=axon (the remote TPU tunnel) from the
# environment; selecting cpu via config still works post-import and keeps
# tests off the (slow, single-claim) tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", None)

import mccortex_tpu  # noqa: E402,F401  (enables x64)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults compiling a program late in the suite once
    ~1000 executables have accumulated in-process (jax 0.9,
    backend_compile_and_load).  Dropping compiled programs between
    modules keeps the process under the trigger threshold; re-compiles
    of shared helpers are the (modest) cost."""
    yield
    jax.clear_caches()
