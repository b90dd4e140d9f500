"""Optimizer plumbing: named Adam optimizers + frozen-path grad masking.

The reference uses fannypack Buddy's named-optimizer dict (cleared between
curriculum phases — train_door.py:130,150,158) and freeze/unfreeze_module for
phase gating. Here freezing is a static set of dotted param paths whose
gradients are zeroed inside the jitted train step (a frozen subtree with an
all-zero Adam state receives exactly zero updates).
"""

from __future__ import annotations

from typing import FrozenSet, Tuple

import jax
import optax

DEFAULT_LEARNING_RATE = 1e-4  # fannypack Buddy's Adam default.


def make_optimizer(learning_rate: float = DEFAULT_LEARNING_RATE):
    return optax.adam(learning_rate)


def _key_path_to_segments(key_path) -> Tuple[str, ...]:
    segments = []
    for entry in key_path:
        if hasattr(entry, "key"):
            segments.append(str(entry.key))
        elif hasattr(entry, "idx"):
            segments.append(str(entry.idx))
        else:
            segments.append(str(entry))
    return tuple(segments)


def zero_frozen_grads(grads, frozen_paths: FrozenSet[str]):
    """Zero gradient subtrees under any frozen dotted path ('' = everything)."""
    if not frozen_paths:
        return grads
    prefixes = [tuple(p.split(".")) if p else () for p in frozen_paths]

    def mask(key_path, leaf):
        segs = _key_path_to_segments(key_path)
        for prefix in prefixes:
            if segs[: len(prefix)] == prefix:
                return jax.numpy.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(mask, grads)


def get_named_optimizer(buddy, name: str, params, learning_rate: float = DEFAULT_LEARNING_RATE):
    """Fetch-or-create a named optimizer in the buddy's clearable dict
    (capability parity with Buddy._optimizer_dict, train_door.py:130)."""
    if name not in buddy._optimizer_dict:
        tx = make_optimizer(learning_rate)
        state = tx.init(params)
        # Warm-start from a restored checkpoint (Buddy.load_checkpoint
        # stashes states for optimizers that didn't exist yet); structure
        # mismatches fall back to the fresh state.
        saved = getattr(buddy, "_pending_optimizer_state", {}).pop(name, None)
        if saved is not None:
            from flax import serialization

            try:
                state = serialization.from_state_dict(state, saved)
            except (KeyError, ValueError, TypeError):
                pass
        buddy._optimizer_dict[name] = {
            "tx": tx,
            "state": state,
            "learning_rate": learning_rate,
        }
    return buddy._optimizer_dict[name]
