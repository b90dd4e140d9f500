"""Compute-precision controls.

``with_compute_dtype(defn, jnp.bfloat16)`` rebuilds a filter def with every
network's observation encoders computing in the given dtype (parameters stay
fp32; features are cast back to fp32 before the filter math). This is the
serving-mode knob: the CNN encoder pass dominates the eval loop
(profiled ~30ms of ~34ms at N=16, T=100), and bf16 halves its bandwidth.
"""

from __future__ import annotations

import dataclasses


def _with_field(obj, field_name: str, field_value):
    """Recursively rebuild a (frozen-dataclass) def tree, setting
    ``field_name`` on every dataclass that has that field."""
    if isinstance(obj, tuple):
        return tuple(_with_field(x, field_name, field_value) for x in obj)
    if not dataclasses.is_dataclass(obj) or isinstance(obj, type):
        return obj
    changes = {}
    for field in dataclasses.fields(obj):
        if field.name == field_name:
            changes[field_name] = field_value
            continue
        if field.name in ("parent", "name"):  # flax module bookkeeping
            continue
        value = getattr(obj, field.name)
        new_value = _with_field(value, field_name, field_value)
        if new_value is not value:
            changes[field.name] = new_value
    if not changes:
        return obj
    return dataclasses.replace(obj, **changes)


def with_compute_dtype(obj, dtype):
    """Set the `dtype` (compute precision) field throughout a def tree."""
    return _with_field(obj, "dtype", dtype)


def with_fold_tail(obj, fold: bool = True):
    """Set the `fold_tail` field throughout a def tree: fuses the linear
    conv3->[pool]->dense image-encoder tail into one matmul (exact same
    linear map, fp-reassociated — see models/encoders.py). Parameter
    structure is unchanged, so checkpoints are interchangeable."""
    return _with_field(obj, "fold_tail", fold)


def with_scan_unroll(obj, unroll: int):
    """Set the `scan_unroll` field throughout a def tree: forward_loop's
    lax.scan unrolls by this factor. Same ops/key stream; deterministic
    filters stay bitwise-identical, PFs may flip tie-level resample draws
    under cross-step fp reassociation (see ParticleFilterDef.scan_unroll).
    Targets small-N serving where the per-step program is op-count-bound
    (profiled N=1 attribution in docs/PERFORMANCE.md)."""
    return _with_field(obj, "scan_unroll", int(unroll))


def with_hoist_rng(obj, hoist: bool = True):
    """Set the `hoist_rng` field throughout a def tree: forward_loop draws
    all per-step PF noise/resampling randoms in ONE batched pre-scan pass
    (bitwise-identical threefry stream — ParticleFilterDef.hoist_rng).
    Default-on; this knob exists for A/B measurement."""
    return _with_field(obj, "hoist_rng", hoist)


def with_hoist_ctrl(obj, hoist: bool = True):
    """Set the `hoist_ctrl` field throughout a def tree: forward_loop
    encodes all T*N control rows in one pre-scan batch instead of
    re-encoding per particle per step (bitwise row math —
    ParticleFilterDef.hoist_ctrl). Default-on; A/B knob."""
    return _with_field(obj, "hoist_ctrl", hoist)


def with_fused_step(obj, fused: bool = True):
    """Set the `fused_step` field throughout a def tree: the eval
    forward_loop runs as ONE Pallas kernel (ops/pallas_fused_step.py) when
    the model/config is supported, falling back to the scan path otherwise.
    Serving knob (MMF_TPU_FUSED_STEP=1): exact recursion, fp-reassociated —
    tie-level resample draws can flip vs the scan path."""
    return _with_field(obj, "fused_step", fused)


def with_stacked_encoders(obj, stack: bool = True):
    """Set the `stack_image_encoders` field on every fusion def in the tree:
    the K independent image encoders consuming the same frame (measurement
    model + gate, virtual sensor + gate) run as ONE channel-stacked pass
    (models/stacked.py). Exact per-encoder math; params unchanged."""
    return _with_field(obj, "stack_image_encoders", stack)
