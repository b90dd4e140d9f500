"""Test config: run on a virtual 8-device CPU mesh (multi-chip shardings are
validated on CPU in lieu of real multi-chip hardware — SURVEY §4).

Note: this environment's sitecustomize registers the axon TPU backend in
every process and pins JAX_PLATFORMS=axon, so we must override via
jax.config (which wins over the env var) before any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles ~100 distinct programs
# (filter defs x train/eval configs); caching them across runs cuts suite
# wall time dramatically.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".scratch", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
