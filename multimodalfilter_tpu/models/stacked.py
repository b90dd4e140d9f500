"""Multi-instance image-encoder stacking.

The flagship fusion models run K *independent* copies of the same thin CNN
image encoder on the SAME input frame (reference architecture:
crossmodal/door_models/layers.py:43-63 instantiated once per consumer):

  - crossmodal PF: the image measurement model's encoder + the gate's
    (crossmodal/door_models/crossmodal_pf.py builds both);
  - crossmodal KF: the image child's virtual-sensor encoder + the gate's
    (crossmodal/door_models/crossmodal_kf.py);
  - measurement-fusion KF: the image virtual sensor + the gate.

Each copy is MXU-lane-starved (conv1/resblock at 32 of 128 output lanes,
conv2 at 16, conv3 at 8 — see docs/PERFORMANCE.md roofline). This module
runs all K copies as ONE channel-stacked pass:

  conv1: the input is *shared*, so the K kernels concatenate along the
         output-channel axis into a single 1->(K*32) conv — K*32 lanes for
         the same reduction depth (a true K-fold lane win);
  resblock/conv2/conv3/folded tail: block-diagonal over encoders via
         grouped convolution (feature_group_count=K) — per-group math is
         IDENTICAL to the individual convs (fp reassociation only), with
         K*32 / K*16 / K*u output lanes per pass and one XLA op per layer
         instead of K;
  final Linear resblock: batched (K, u, u) einsum.

Parameter structure is untouched — this is a pure *execution* transform on
the existing per-encoder param subtrees (like the folded tail,
models/encoders.py::_fold_tail_weights), so checkpoints are interchangeable
and the opt-in (``MMF_TPU_STACK_ENC=1`` / ``with_stacked_encoders``) can
flip at any time.

Eligibility: every stacked instance must share the encoder architecture
(units, spanning_avg_pool, dtype, fold_tail). Mixed configs (e.g. the push
task's spanning-pool measurement encoder vs its flatten-variant gate) fall
back to the per-instance path automatically.

MEASURED OUTCOME (round 3, TPU v5e — keep before enabling): stacking
REGRESSES serving throughput in every regime (bf16+fold N=512:
474k -> 323k steps/s; fp32 N>=256 OOMs from the doubled live activation
set; N=16 -13..-22%). XLA expands grouped convs to block-diagonal full
convs (2x FLOPs), and output lanes that do not share an input reduction
cannot share MXU passes, so only conv1 (truly shared input) wins — too
small to matter. Full analysis: docs/PERFORMANCE.md "Multi-instance
encoder stacking (measured refutation)". The module stays as the recorded
experiment behind MMF_TPU_STACK_ENC=1 (default off, excluded from
MMF_TPU_SERVING).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import _dual_spanning_avg_pool, _fold_tail_weights


def _conv(x, w, padding: str, groups: int = 1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def stacked_image_features(
    param_trees: Sequence[dict],
    images: jnp.ndarray,
    *,
    spanning_avg_pool: bool = False,
    dtype=None,
    fold_tail: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Run K same-architecture ImageEncoders over the same frames in one
    channel-stacked pass.

    Args:
      param_trees: K ImageEncoder param dicts (keys conv1, resblock_conv,
        conv2, conv3, dense, resblock) — e.g.
        ``params["obs_encoders"]["observation_image_layers"]`` of each
        consumer network.
      images: (N, 32, 32) or (N, 32, 32, 1) frames shared by all K.
      spanning_avg_pool/dtype/fold_tail: the (common) encoder config.

    Returns K feature arrays of shape (N, units), each equal (up to fp
    reassociation, ~1e-6 fp32) to running that encoder individually.
    """
    k = len(param_trees)
    assert k >= 2, "stacking needs at least two encoder instances"

    def cast(v):
        return v.astype(dtype) if dtype is not None else v

    def cat(fn):
        return jnp.concatenate([cast(fn(p)) for p in param_trees], axis=-1)

    x = images[..., None] if images.ndim == 3 else images
    n = x.shape[0]
    x = cast(x)

    # conv1 — shared single-channel input, so a plain (not grouped) conv
    # with K*32 output channels.
    x = _conv(x, cat(lambda p: p["conv1"]["kernel"]), "SAME")
    x = x + cat(lambda p: p["conv1"]["bias"])
    x = jax.nn.relu(x)

    # Conv2dResblock — grouped 3x3 convs, block-diagonal over encoders.
    residual = x
    for blk in ("block1", "block2"):
        x = _conv(x, cat(lambda p: p["resblock_conv"][blk]["kernel"]),
                  "SAME", groups=k)
        x = x + cat(lambda p: p["resblock_conv"][blk]["bias"])
        x = jax.nn.relu(x)
    x = x + residual

    # conv2 — grouped 32->16 per encoder.
    x = _conv(x, cat(lambda p: p["conv2"]["kernel"]), "SAME", groups=k)
    x = x + cat(lambda p: p["conv2"]["bias"])
    x = jax.nn.relu(x)

    if fold_tail and x.shape[1:3] == (32, 32):
        # Per-encoder folded conv3->[pool]->dense tail (exact — see
        # _fold_tail_weights), stacked into one grouped VALID conv with
        # K*units output lanes. Applied as two half-height convs summed for
        # the same XLA-layout reason as the single-encoder fold
        # (models/encoders.py).
        folded = [
            _fold_tail_weights(
                p["conv3"]["kernel"], p["conv3"]["bias"],
                p["dense"]["kernel"], p["dense"]["bias"],
                spanning_avg_pool,
            )
            for p in param_trees
        ]
        u = folded[0][0].shape[1]
        w_conv = jnp.concatenate(
            [cast(w.reshape(32, 32, 16, u)) for w, _ in folded], axis=-1
        )  # (32, 32, 16, K*u)
        b_eff = jnp.concatenate([b for _, b in folded], axis=-1)
        y0 = _conv(x[:, :16], w_conv[:16], "VALID", groups=k)
        y1 = _conv(x[:, 16:], w_conv[16:], "VALID", groups=k)
        x = (y0 + y1).reshape(n, k * u) + b_eff.astype(y0.dtype)
    else:
        # conv3 grouped, then the per-encoder [pool/]flatten + dense (the
        # dense inputs are per-encoder spatial layouts, so they stay
        # per-encoder matmuls — exactly the unfused cost).
        x = _conv(x, cat(lambda p: p["conv3"]["kernel"]), "SAME", groups=k)
        x = x + cat(lambda p: p["conv3"]["bias"])
        c3 = x.shape[-1] // k
        outs = []
        for g, p in enumerate(param_trees):
            xg = x[..., g * c3:(g + 1) * c3]
            if spanning_avg_pool:
                xg = _dual_spanning_avg_pool(xg, reduce_size=2)
            else:
                xg = xg.reshape(n, -1)
            outs.append(
                xg @ cast(p["dense"]["kernel"]) + cast(p["dense"]["bias"])
            )
        x = jnp.concatenate(outs, axis=-1)  # (N, K*u)

    x = jax.nn.relu(x)

    # Final LinearResblock per encoder — tiny (u x u) maps, batched einsum.
    u = x.shape[-1] // k
    xk = x.reshape(n, k, u)
    residual = xk
    for blk in ("block1", "block2"):
        w = jnp.stack([cast(p["resblock"][blk]["kernel"]) for p in param_trees])
        b = jnp.stack([cast(p["resblock"][blk]["bias"]) for p in param_trees])
        xk = jnp.einsum("nku,kuv->nkv", xk, w) + b[None]
        xk = jax.nn.relu(xk)
    xk = xk + residual

    return tuple(xk[:, g] for g in range(k))


def encoder_stack_config(net) -> Optional[tuple]:
    """The (units, spanning_avg_pool, dtype, fold_tail) stacking signature of
    a network owning an ``obs_encoders`` image encoder, or None if the net
    doesn't encode images (or isn't a task net at all — e.g. analytic test
    models). Two nets stack iff their signatures are equal."""
    if not (hasattr(net, "units") and hasattr(net, "fold_tail")):
        return None
    if "image" not in getattr(net, "modalities", ("image",)):
        return None
    return (
        net.units,
        bool(getattr(net, "spanning_avg_pool", False)),
        net.dtype,
        bool(net.fold_tail),
    )


IMAGE_ENCODER_PATH = ("obs_encoders", "observation_image_layers")


def image_encoder_params(net_params: dict) -> dict:
    """The ImageEncoder param subtree inside a consumer network's params."""
    return net_params[IMAGE_ENCODER_PATH[0]][IMAGE_ENCODER_PATH[1]]
