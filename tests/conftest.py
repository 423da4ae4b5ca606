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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mctx_jax_cache")

import jax  # noqa: E402

# The jaxtyping pytest plugin imports jax BEFORE this conftest, so jax has
# already captured JAX_PLATFORMS=axon (the remote TPU tunnel) from the
# environment; selecting cpu via config still works post-import and keeps
# tests off the (slow, single-claim) tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import mccortex_tpu  # noqa: E402,F401  (enables x64)
