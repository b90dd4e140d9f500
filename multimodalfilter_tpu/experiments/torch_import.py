"""Import trained reference (PyTorch) checkpoints into this framework.

The reference trains torch models whose module tree this framework's param
tree deliberately mirrors (containers: ``dynamics_model``,
``measurement_model.measurement_models.0``, ``filter_models.1.virtual_sensor_model``,
...). This converter translates a torch ``state_dict`` into our params so a
user of the reference can switch frameworks and keep their checkpoints.

Handled representation differences:
  - torch ``nn.Sequential`` indices -> our named flax submodules (the
    per-architecture index maps below encode the reference layer stacks, e.g.
    crossmodal/door_models/dynamics.py:26-34, pf.py:43-59, kf.py:49-78).
  - Linear: torch (out, in) -> flax kernel (in, out) transpose.
  - Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out) transpose.
  - The CNN flatten boundary: torch flattens NCHW (c, h, w) while flax
    flattens NHWC (h, w, c) — the dense layer after the flatten gets its
    input rows permuted accordingly (both the 8192-flatten and the
    dual-spanning-avg-pool variants).
  - fannypack resblock child names are auto-detected (two linear children,
    ordered by name).

Semantics caveat (crossmodal-KF gate): the reference's weight model reshapes
its (N, K*state_dim) gate output row-major to (K, N, state_dim)
(/root/reference/crossmodal/door_models/crossmodal_kf.py:158), which mixes
weights across batch elements. This framework deliberately fixes that
(batch-independent reshape — models/task_nets.py:KFWeightNet), so a trained
reference crossmodal-KF checkpoint imported here produces reference-equal
outputs only at batch size N=1. For bit-faithful N>1 validation, flip the
gate net's flag after import:

    gate = defn.crossmodal_weight_model
    defn = dataclasses.replace(defn, crossmodal_weight_model=
        dataclasses.replace(gate, net=dataclasses.replace(
            gate.net, reference_reshape=True)))

(tested in tests/test_torch_import.py::test_import_gate_reference_reshape).

Usage:
    params = convert_filter_state_dict(state_dict, model.definition)
    model.params = params
or via Buddy:
    buddy.load_torch_checkpoint("experiment.ckpt")
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np


# ---------------------------------------------------------------------------
# Key-tree helpers
# ---------------------------------------------------------------------------


def _subtree(state_dict: Dict[str, np.ndarray], prefix: str):
    """All keys under a dotted prefix, with the prefix stripped."""
    out = {}
    prefix_dot = prefix + "." if prefix else ""
    for key, value in state_dict.items():
        if key.startswith(prefix_dot):
            out[key[len(prefix_dot):]] = value
    if not out:
        raise KeyError(f"No torch parameters under prefix {prefix!r}")
    return out


def _to_np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sub, prefix):
    w = _to_np(sub[f"{prefix}.weight"])
    b = _to_np(sub[f"{prefix}.bias"])
    return {"kernel": w.T, "bias": b}


def _conv(sub, prefix):
    w = _to_np(sub[f"{prefix}.weight"])  # (out, in, kh, kw)
    b = _to_np(sub[f"{prefix}.bias"])
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _resblock(sub, prefix, conv=False):
    """fannypack resblock: two (linear|conv) children, auto-detected and
    ordered by name (block1 < block2 in the upstream implementation)."""
    children = sorted(
        {
            key[len(prefix) + 1:].rsplit(".", 1)[0]
            for key in sub
            if key.startswith(prefix + ".") and key.endswith(".weight")
        }
    )
    assert len(children) == 2, (
        f"Expected 2 linear/conv children under resblock {prefix!r}, "
        f"found {children}"
    )
    load = _conv if conv else _linear
    return {
        "block1": load(sub, f"{prefix}.{children[0]}"),
        "block2": load(sub, f"{prefix}.{children[1]}"),
    }


def _mlp_encoder(sub, prefix):
    """Reference: Sequential(Linear, ReLU, resblock) — layers.py:20-24."""
    return {
        "dense": _linear(sub, f"{prefix}.0"),
        "resblock": _resblock(sub, f"{prefix}.2"),
    }


def _flatten_permutation(h, w, c):
    """Row permutation taking a torch (c, h, w)-flattened feature index to
    the flax (h, w, c)-flattened position: perm[torch_idx] = flax_idx."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # torch layout
    return idx.transpose(1, 2, 0).reshape(-1)  # order visited by flax


def _image_encoder(sub, prefix, spanning_avg_pool=False):
    """Reference image stacks (door layers.py:52-63; push layers.py:77-104):
      flatten variant:  [Conv5x5(32), ReLU, ConvRes(32), Conv3x3(16), ReLU,
                         Conv3x3(8), Flatten, Linear, ReLU, resblock]
                        indices: 0, 2, 3, 5, 7, 9
      spanning variant: [Conv5x5(32), ReLU, ConvRes(32), Conv3x3(16), ReLU,
                         Conv3x3(2), DualSpanningAvgPool, Linear, ReLU, res]
                        indices: 0, 2, 3, 5, 7, 9 (same)
    """
    params = {
        "conv1": _conv(sub, f"{prefix}.0"),
        "resblock_conv": _resblock(sub, f"{prefix}.2", conv=True),
        "conv2": _conv(sub, f"{prefix}.3"),
        "conv3": _conv(sub, f"{prefix}.5"),
        "dense": _linear(sub, f"{prefix}.7"),
        "resblock": _resblock(sub, f"{prefix}.9"),
    }
    # Permute the post-flatten dense input rows from torch's channel-first
    # flatten order to flax's channel-last order: perm[j] is the torch flat
    # index of the feature that sits at flax position j, so
    # kernel_flax[j] = kernel_torch[perm[j]].
    kernel = params["dense"]["kernel"]  # (in, out) already transposed
    if spanning_avg_pool:
        # torch: concat(pool_h flat (c=2,1,16), pool_w flat (c=2,16,1));
        # flax: same halves flattened channel-last — both halves share the
        # same 32-element interleave.
        perm_half = _flatten_permutation(1, 16, 2)
        perm = np.concatenate([perm_half, perm_half + 32])
    else:
        perm = _flatten_permutation(32, 32, 8)
    params["dense"]["kernel"] = kernel[perm]
    return params


def _obs_encoders(sub, modalities, spanning_avg_pool=False):
    out = {}
    if "image" in modalities:
        out["observation_image_layers"] = _image_encoder(
            sub, "observation_image_layers", spanning_avg_pool
        )
    if "pos" in modalities:
        out["observation_pos_layers"] = _mlp_encoder(sub, "observation_pos_layers")
    if "sensors" in modalities:
        out["observation_sensors_layers"] = _mlp_encoder(
            sub, "observation_sensors_layers"
        )
    return out


# ---------------------------------------------------------------------------
# Per-net converters (reference Sequential index maps in docstrings)
# ---------------------------------------------------------------------------


def convert_dynamics(sub) -> dict:
    """DynamicsNet <- reference dynamics.py:26-34:
    shared_layers = Sequential(Linear, res, res, res, Linear): 0..4."""
    return {
        "state_layers": _mlp_encoder(sub, "state_layers"),
        "control_layers": _mlp_encoder(sub, "control_layers"),
        "shared_dense_in": _linear(sub, "shared_layers.0"),
        "shared_resblock0": _resblock(sub, "shared_layers.1"),
        "shared_resblock1": _resblock(sub, "shared_layers.2"),
        "shared_resblock2": _resblock(sub, "shared_layers.3"),
        "shared_dense_out": _linear(sub, "shared_layers.4"),
    }


def convert_measurement(sub, net) -> dict:
    """LogLikelihoodNet <- reference pf.py:43-59:
    shared_layers = Sequential(Linear, ReLU, res, res, Linear): 0, 2, 3, 4."""
    return {
        "obs_encoders": _obs_encoders(sub, net.modalities, net.spanning_avg_pool),
        "state_layers": _mlp_encoder(sub, "state_layers"),
        "shared_dense_in": _linear(sub, "shared_layers.0"),
        "shared_resblock0": _resblock(sub, "shared_layers.2"),
        "shared_resblock1": _resblock(sub, "shared_layers.3"),
        "shared_dense_out": _linear(sub, "shared_layers.4"),
    }


def convert_virtual_sensor(sub, net) -> dict:
    """VirtualSensorNet <- reference kf.py:56-76:
    shared = Sequential(Linear, ReLU, res, res): 0, 2, 3
    z/r heads = Sequential(Linear, ReLU, res, Linear): 0, 2, 3."""
    params = {
        "obs_encoders": _obs_encoders(sub, net.modalities, net.spanning_avg_pool),
        "shared_dense_in": _linear(sub, "shared_layers.0"),
        "shared_resblock0": _resblock(sub, "shared_layers.2"),
        "shared_resblock1": _resblock(sub, "shared_layers.3"),
    }
    for head in ("z_layer", "r_layer"):
        params[f"{head}_dense_in"] = _linear(sub, f"{head}.0")
        params[f"{head}_resblock"] = _resblock(sub, f"{head}.2")
        params[f"{head}_dense_out"] = _linear(sub, f"{head}.3")
    return params


def convert_kf_weight(sub) -> dict:
    """KFWeightNet <- reference crossmodal_kf.py:117-123:
    fusion = Sequential(Linear, ReLU, res, Linear, Sigmoid): 0, 2, 3."""
    return {
        "obs_encoders": _obs_encoders(sub, ("image", "pos", "sensors")),
        "fusion_dense_in": _linear(sub, "fusion_layers.0"),
        "fusion_resblock0": _resblock(sub, "fusion_layers.2"),
        "fusion_dense_out": _linear(sub, "fusion_layers.3"),
    }


def convert_pf_weight(sub, net) -> dict:
    """PFWeightNet <- reference door crossmodal_pf.py:64-72 (3 resblocks) /
    push crossmodal_pf.py (1 resblock): fusion indices 0, 2..(2+n-1), 2+n."""
    n = net.num_fusion_resblocks
    params = {
        "obs_encoders": _obs_encoders(sub, ("image", "pos", "sensors")),
        "fusion_dense_in": _linear(sub, "fusion_layers.0"),
        "fusion_dense_out": _linear(sub, f"fusion_layers.{2 + n}"),
    }
    for i in range(n):
        params[f"fusion_resblock{i}"] = _resblock(sub, f"fusion_layers.{2 + i}")
    return params


# ---------------------------------------------------------------------------
# Def-tree walker
# ---------------------------------------------------------------------------


def _convert_leaf(defn, sub):
    from ..filtering.base import DynamicsDef, MeasurementDef, VirtualSensorDef
    from ..filtering.fusion import KFWeightDef, PFWeightDef

    if isinstance(defn, DynamicsDef):
        return convert_dynamics(sub)
    if isinstance(defn, MeasurementDef):
        return convert_measurement(sub, defn.net)
    if isinstance(defn, VirtualSensorDef):
        return convert_virtual_sensor(sub, defn.net)
    if isinstance(defn, KFWeightDef):
        return convert_kf_weight(sub)
    if isinstance(defn, PFWeightDef):
        return convert_pf_weight(sub, defn.net)
    return None


_CONTAINER_FIELDS = (
    "dynamics_model",
    "measurement_model",
    "virtual_sensor_model",
    "crossmodal_weight_model",
    "filter_models",
    "measurement_models",
)


def convert_filter_state_dict(state_dict, definition) -> dict:
    """Convert a reference torch state_dict into this framework's params for
    `definition` (recursively mirrors the shared container paths)."""
    state_dict = {k: v for k, v in state_dict.items()}

    def walk(defn, prefix):
        sub = _subtree(state_dict, prefix) if prefix else dict(state_dict)
        leaf = _convert_leaf(defn, sub)
        if leaf is not None:
            return leaf
        params = {}
        for field in dataclasses.fields(defn):
            if field.name not in _CONTAINER_FIELDS:
                continue
            value = getattr(defn, field.name)
            if value is None:
                continue
            child_prefix = f"{prefix}.{field.name}" if prefix else field.name
            if isinstance(value, tuple):
                params[field.name] = {
                    str(i): walk(child, f"{child_prefix}.{i}")
                    for i, child in enumerate(value)
                }
            else:
                params[field.name] = walk(value, child_prefix)
        assert params, f"No convertible components in {type(defn).__name__}"
        return params

    return walk(definition, "")


def load_reference_checkpoint(path: str, definition) -> dict:
    """Load a reference/fannypack torch checkpoint file and convert it."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return convert_filter_state_dict(blob, definition)
