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
import jax
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


def _fold_tail_weights(k3, b3, kd, bd, spanning_avg_pool: bool):
    """Compose the (linear) conv3 -> [pool] -> flatten -> dense tail into ONE
    dense map from the conv2 activation (32*32*16) to `units`.

    There is no ReLU between conv3 and the dense (see __call__ below /
    reference door layers.py:43-63), so the composition is *mathematically
    exact* — only fp summation order changes (observed ~1e-6 abs). The fold
    removes the conv3 activation round-trip through HBM (the (N,32,32,8)
    intermediate, 1.7GB at the saturated serving batch) and replaces a
    lane-starved 16->8 conv (8 of 128 MXU lanes) plus an 8192-wide dense
    with a single well-shaped matmul — measured ~13%% off the encoder pass.

    Construction: the dense weight is reshaped onto the conv3 output grid
    ((un)pooling it for the push spanning-avg-pool variant), then correlated
    with the spatially-flipped conv3 kernel — i.e. W' = conv3^T applied to
    the dense weight, a one-time (u,32,32)-batch conv that XLA hoists out
    of eval loops (params are loop-invariant).
    """
    u = kd.shape[1]
    if spanning_avg_pool:
        # Un-pool kd (64, u): rows [0,32) are the full-height pool (index
        # wp*2+c), rows [32,64) the full-width pool (hp*2+c); each pooled
        # feature averaged 64 pixels (see _dual_spanning_avg_pool).
        c3 = k3.shape[-1]
        kd_h = kd[:32].reshape(16, 2, u)
        kd_w = kd[32:].reshape(16, 2, u)
        kd_h_full = jnp.broadcast_to(
            jnp.repeat(kd_h[None], 2, axis=1).reshape(1, 32, c3, u),
            (32, 32, c3, u),
        )
        kd_w_full = jnp.broadcast_to(
            jnp.repeat(kd_w[:, None], 2, axis=0).reshape(32, 1, c3, u),
            (32, 32, c3, u),
        )
        kd_eff = (kd_h_full + kd_w_full) / 64.0  # (h, w, c3, u)
    else:
        kd_eff = kd.reshape(32, 32, k3.shape[-1], u)
    kd_img = kd_eff.transpose(3, 0, 1, 2)  # (u, 32, 32, c3)
    k3_flip = k3[::-1, ::-1].transpose(0, 1, 3, 2)  # (3, 3, c3, 16)
    # HIGHEST precision: this one-time construction must not add bf16-pass
    # error of its own (on TPU, default-precision convs run as bf16 MXU
    # passes; measured 9e-5 abs error on the folded weight without this).
    w_img = jax.lax.conv_general_dilated(
        kd_img, k3_flip, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (u, 32, 32, 16)
    w_flat = w_img.transpose(1, 2, 3, 0).reshape(32 * 32 * 16, u)
    b_eff = bd + jnp.einsum("c,hwcu->u", b3, kd_eff)
    return w_flat, b_eff


class ImageEncoder(nn.Module):
    """CNN encoder over (N, 32, 32) grayscale images.

    spanning_avg_pool selects the push-task variant
    (crossmodal/push_models/layers.py:68-104); default is the shared flatten
    variant (crossmodal/door_models/layers.py:43-63).

    fold_tail=True (opt-in, MMF_TPU_FOLD_ENC=1 via StatefulFilter) fuses the
    linear conv3->[pool]->dense tail into one matmul — exact same linear
    map, fp-reassociated (see _fold_tail_weights). Parameter structure is
    unchanged (checkpoints are interchangeable between modes).
    """

    units: int
    spanning_avg_pool: bool = False
    dtype: Any = None  # compute dtype (params stay fp32)
    fold_tail: bool = False

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
        c3 = 2 if self.spanning_avg_pool else 8
        conv3 = nn.Conv(c3, (3, 3), padding="SAME", name="conv3", dtype=self.dtype)
        dense = nn.Dense(self.units, name="dense", dtype=self.dtype)
        if self.fold_tail and not self.is_initializing() and x.shape[1:3] == (32, 32):
            p = self.variables["params"]
            w_flat, b_eff = _fold_tail_weights(
                p["conv3"]["kernel"], p["conv3"]["bias"],
                p["dense"]["kernel"], p["dense"]["bias"],
                self.spanning_avg_pool,
            )
            # Apply the folded map as a 32x32 VALID convolution rather than
            # reshape+matmul: the conv consumes the NHWC conv2 activation in
            # its native layout (the reshape form forces a multi-GB relayout
            # copy of the activation at serving batches — measured 10.6ms vs
            # 14.7ms vs 76.5ms for fold-conv / fold-matmul / unfused at the
            # 51200-frame saturated batch).
            u = w_flat.shape[1]
            w_conv = w_flat.reshape(32, 32, 16, u)
            if self.dtype is not None:
                w_conv = w_conv.astype(self.dtype)
                x = x.astype(self.dtype)
            # Two half-height VALID convs (rows 0-15 / 16-31) summed, not
            # one full-window conv: XLA canonicalizes a full-input-window
            # conv into reshape+dot, which forces a relayout of the multi-GB
            # conv2 activation at large fp32 batches (measured -15% at
            # N=512); a partial-window conv keeps conv2's consumer a conv
            # and its layout chain intact.
            y0 = jax.lax.conv_general_dilated(
                x[:, :16], w_conv[:16], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y1 = jax.lax.conv_general_dilated(
                x[:, 16:], w_conv[16:], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = (y0 + y1).reshape(n, u) + b_eff.astype(y0.dtype)
        else:
            x = conv3(x)
            if self.spanning_avg_pool:
                x = _dual_spanning_avg_pool(x, reduce_size=2)
            else:
                x = x.reshape(n, -1)  # (N, 32*32*8)
            x = dense(x)
        x = nn.relu(x)
        x = LinearResblock(self.units, dtype=self.dtype, name="resblock")(x)
        return x
