"""Core type aliases and containers.

Mirrors the capability of ``torchfilter.types`` (used by the reference at
e.g. crossmodal/tasks/_door.py:298-304, crossmodal/door_models/kf.py:81-83)
with JAX/numpy equivalents.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Union

import jax
import numpy as np

# A pytree of parameters: nested dicts of arrays. Top-level keys mirror the
# reference's torch submodule paths ("dynamics_model", "filter_models.0", ...).
Params = Any

# Observations may be a single array or a dict of arrays keyed by modality
# ("image", "gripper_pos", "gripper_sensors").
Array = jax.Array
ArrayDict = Dict[str, Array]
Observations = Union[Array, ArrayDict]
Controls = Array
States = Array
ScaleTril = Array

PRNGKey = jax.Array


class Trajectory(NamedTuple):
    """A single trajectory: states (T, state_dim), observations dict of
    (T, ...) arrays, controls (T, control_dim).

    Equivalent to ``torchfilter.types.TrajectoryNumpy`` (reference usage:
    crossmodal/tasks/_door.py:298-304).
    """

    states: np.ndarray
    observations: Dict[str, np.ndarray]
    controls: np.ndarray


# Alias kept for reference-API familiarity.
TrajectoryNumpy = Trajectory


class GaussianBelief(NamedTuple):
    """EKF belief: mean (N, state_dim), covariance (N, state_dim, state_dim)."""

    mean: Array
    cov: Array


class ParticleBelief(NamedTuple):
    """Particle filter belief.

    particles: (N, M, state_dim)
    log_weights: (N, M), normalized so logsumexp over M is 0.
    """

    particles: Array
    log_weights: Array
