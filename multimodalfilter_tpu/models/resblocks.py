"""Residual blocks.

Capability parity with ``fannypack.nn.resblocks.{Linear, Conv2d}``, which
every encoder in the reference is built from (crossmodal/door_models/
layers.py:3,23,55). Semantics: two (linear|conv) layers, each followed by a
ReLU, added to an identity skip:

    y = x + relu(W2 @ relu(W1 @ x))

Implemented as flax.linen modules; weights init matches flax defaults
(lecun_normal) — exact torch-init parity is not a goal (no reference
checkpoints exist in-tree), architectural equivalence is.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn


class LinearResblock(nn.Module):
    units: int
    bottleneck_units: Optional[int] = None
    dtype: Any = None  # compute dtype (params stay fp32); None = fp32

    @nn.compact
    def __call__(self, x):
        bottleneck = self.bottleneck_units or self.units
        residual = x
        x = nn.Dense(bottleneck, name="block1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.units, name="block2", dtype=self.dtype)(x)
        x = nn.relu(x)
        return x + residual


class Conv2dResblock(nn.Module):
    """Residual conv block over NHWC inputs (reference uses NCHW; layout is a
    TPU-friendly choice — convs are layout-agnostic up to a permutation)."""

    channels: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        k = (self.kernel_size, self.kernel_size)
        x = nn.Conv(self.channels, k, padding="SAME", name="block1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, k, padding="SAME", name="block2", dtype=self.dtype)(x)
        x = nn.relu(x)
        return x + residual
