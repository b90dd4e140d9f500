"""Compute-precision controls.

``with_compute_dtype(defn, jnp.bfloat16)`` rebuilds a filter def with every
network's observation encoders computing in the given dtype (parameters stay
fp32; features are cast back to fp32 before the filter math). This is the
serving-mode knob: the CNN encoder pass dominates the eval loop
(profiled ~30ms of ~34ms at N=16, T=100), and bf16 halves its bandwidth.
"""

from __future__ import annotations

import dataclasses


def with_compute_dtype(obj, dtype):
    """Recursively rebuild a (frozen-dataclass) def tree, setting the `dtype`
    field on every dataclass that has one."""
    if isinstance(obj, tuple):
        return tuple(with_compute_dtype(x, dtype) for x in obj)
    if not dataclasses.is_dataclass(obj) or isinstance(obj, type):
        return obj
    changes = {}
    for field in dataclasses.fields(obj):
        if field.name == "dtype":
            changes["dtype"] = dtype
            continue
        if field.name in ("parent", "name"):  # flax module bookkeeping
            continue
        value = getattr(obj, field.name)
        new_value = with_compute_dtype(value, dtype)
        if new_value is not value:
            changes[field.name] = new_value
    if not changes:
        return obj
    return dataclasses.replace(obj, **changes)
