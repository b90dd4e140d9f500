"""Observation/state/control encoder blocks.

These reproduce the encoder factories of the reference's task ``layers.py``
modules (crossmodal/door_models/layers.py:11-95 and
crossmodal/push_models/layers.py:11-136, incl. ``_DualSpanningAvgPool``),
as flax modules parameterized by input dim so one implementation serves both
tasks.

All encoders map to a `units`-dim feature vector:
  MLP encoders:  Dense(units) -> ReLU -> LinearResblock(units)
  Image encoder: Conv5x5(32) -> ReLU -> Conv2dResblock(32,k3) ->
                 Conv3x3(16) -> ReLU -> Conv3x3(8) -> flatten(8192) ->
                 Dense(units) -> ReLU -> LinearResblock(units)
  Image encoder (spanning_avg_pool=True, push variant):
                 ... -> Conv3x3(2) -> dual spanning avg-pool (full-height +
                 full-width, reduce 2) -> Dense(units) -> ReLU -> resblock
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resblocks import Conv2dResblock, LinearResblock


class MLPEncoder(nn.Module):
    """Dense -> ReLU -> LinearResblock. Input dim inferred from data."""

    units: int
    dtype: Any = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.units, name="dense", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = LinearResblock(self.units, dtype=self.dtype, name="resblock")(x)
        return x


# Aliases that make task-model definitions read like the reference layers.py.
StateEncoder = MLPEncoder
ControlEncoder = MLPEncoder


def _dual_spanning_avg_pool(x: jnp.ndarray, reduce_size: int = 2) -> jnp.ndarray:
    """Two average pools: one spanning full height, one full width; flattened
    + concatenated. Matches crossmodal/push_models/layers.py:43-65 (NHWC).
    """
    n, h, w, c = x.shape
    pooled_h = nn.avg_pool(x, (h, reduce_size), strides=(h, reduce_size))
    pooled_w = nn.avg_pool(x, (reduce_size, w), strides=(reduce_size, w))
    return jnp.concatenate(
        [pooled_h.reshape(n, -1), pooled_w.reshape(n, -1)], axis=-1
    )


class ImageEncoder(nn.Module):
    """CNN encoder over (N, 32, 32) grayscale images.

    spanning_avg_pool selects the push-task variant
    (crossmodal/push_models/layers.py:68-104); default is the shared flatten
    variant (crossmodal/door_models/layers.py:43-63).
    """

    units: int
    spanning_avg_pool: bool = False
    dtype: Any = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, images):
        # Accept (N, H, W) or (N, H, W, 1); work in NHWC.
        if images.ndim == 3:
            x = images[..., None]
        else:
            x = images
        n = x.shape[0]

        x = nn.Conv(32, (5, 5), padding="SAME", name="conv1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = Conv2dResblock(32, 3, dtype=self.dtype, name="resblock_conv")(x)
        x = nn.Conv(16, (3, 3), padding="SAME", name="conv2", dtype=self.dtype)(x)
        x = nn.relu(x)
        if self.spanning_avg_pool:
            x = nn.Conv(2, (3, 3), padding="SAME", name="conv3", dtype=self.dtype)(x)
            x = _dual_spanning_avg_pool(x, reduce_size=2)
        else:
            x = nn.Conv(8, (3, 3), padding="SAME", name="conv3", dtype=self.dtype)(x)
            x = x.reshape(n, -1)  # (N, 32*32*8)
        x = nn.Dense(self.units, name="dense", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = LinearResblock(self.units, dtype=self.dtype, name="resblock")(x)
        return x
