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
