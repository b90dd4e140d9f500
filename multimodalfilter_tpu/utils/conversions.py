"""Host<->device conversion helpers.

Capability parity with ``fannypack.utils.{to_torch, to_numpy}`` (reference
usage: crossmodal/eval_helpers.py:100-106,152-157), JAX-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_device(tree, device=None):
    """Recursively move numpy arrays in a pytree onto a JAX device."""

    def _convert(x):
        if isinstance(x, (np.ndarray, np.generic)):
            x = jnp.asarray(x)
        if device is not None and isinstance(x, jax.Array):
            x = jax.device_put(x, device)
        return x

    return jax.tree_util.tree_map(_convert, tree)


def to_numpy(tree):
    """Recursively convert JAX arrays in a pytree to host numpy arrays."""

    def _convert(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(_convert, tree)
