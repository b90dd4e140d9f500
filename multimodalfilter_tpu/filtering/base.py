"""Filter runtime base: the capability surface of ``torchfilter.base``
(reference usage sites in SURVEY §2.4), re-designed functionally for TPU.

Key inversion vs the reference (SURVEY §7): beliefs are explicit pytrees
threaded through pure ``step`` functions; ``forward_loop`` is a
``jax.lax.scan``. Filter *defs* are frozen dataclasses (static config +
network definitions) whose methods are pure functions of
``(params, belief, inputs, key)``.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import Params

# Static observation spec: tuple of (key, trailing shape) pairs (hashable).
ObsSpec = Tuple[Tuple[str, Tuple[int, ...]], ...]

DEFAULT_OBS_SPEC: ObsSpec = (
    ("image", (32, 32)),
    ("gripper_pos", (3,)),
    ("gripper_sensors", (7,)),
)


def example_observations(obs_spec: ObsSpec, batch: int = 1) -> Dict[str, jnp.ndarray]:
    return {k: jnp.zeros((batch,) + shape, jnp.float32) for k, shape in obs_spec}


@dataclasses.dataclass(frozen=True)
class DynamicsDef:
    """Wraps a dynamics network: (states (B, D), controls (B, C)) ->
    (new_states (B, D), scale_tril (B, D, D)).

    Capability parity with ``torchfilter.base.DynamicsModel`` incl.
    ``forward_loop`` (noise-free rollout used by eval_dynamics —
    crossmodal/eval_helpers.py:135-137)."""

    net: Any  # flax linen module with (states, controls) -> (new, scale_tril)
    state_dim: int
    control_dim: int = 7
    # Hoist the control encoder out of forward_loop's scan (one batched
    # (T*N)-row pass instead of T in-scan passes; bitwise row math — see
    # ParticleFilterDef.hoist_ctrl / VirtualSensorEKFDef.hoist_ctrl,
    # tests/test_ekf_hoist.py). Affects the noise-free rollout used by
    # eval_dynamics and train_dynamics_recurrent.
    hoist_ctrl: bool = True

    def init(self, key) -> Params:
        states = jnp.zeros((1, self.state_dim), jnp.float32)
        controls = jnp.zeros((1, self.control_dim), jnp.float32)
        return self.net.init(key, states, controls)["params"]

    def apply(self, params: Params, states, controls):
        return self.net.apply({"params": params}, states, controls)

    @property
    def supports_control_hoist(self) -> bool:
        """True when the net splits into a carry-independent control encoder
        + remainder (DynamicsNet does; custom nets may not)."""
        return hasattr(self.net, "encode_controls") and hasattr(
            self.net, "from_control_features"
        )

    def encode_controls(self, params: Params, controls):
        """Carry-independent control features — pf.forward_loop hoists this
        out of the filter scan and batches it over all T*N rows."""
        return self.net.apply(
            {"params": params}, controls, method=type(self.net).encode_controls
        )

    def apply_with_control_features(self, params: Params, states, control_features):
        return self.net.apply(
            {"params": params}, states, control_features,
            method=type(self.net).from_control_features,
        )

    def forward_loop(self, params: Params, initial_states, controls_seq):
        """Noise-free mean rollout. controls_seq: (T, N, C). Returns
        (states (T, N, D), scale_trils (T, N, D, D))."""
        if self.hoist_ctrl and self.supports_control_hoist:
            t, n = controls_seq.shape[:2]
            flat = controls_seq.reshape((t * n,) + controls_seq.shape[2:])
            cf = self.encode_controls(params, flat)
            cf_seq = cf.reshape((t, n) + cf.shape[1:])

            def step(carry, cf_t):
                new_states, scale_tril = self.apply_with_control_features(
                    params, carry, cf_t
                )
                return new_states, (new_states, scale_tril)

            _, (states, scale_trils) = jax.lax.scan(
                step, initial_states, cf_seq
            )
            return states, scale_trils

        def step(carry, controls_t):
            new_states, scale_tril = self.apply(params, carry, controls_t)
            return new_states, (new_states, scale_tril)

        _, (states, scale_trils) = jax.lax.scan(step, initial_states, controls_seq)
        return states, scale_trils


@dataclasses.dataclass(frozen=True)
class MeasurementDef:
    """Wraps a particle-filter measurement network:
    (states (N, M, D), observations) -> log-likelihoods (N, M).

    Capability parity with ``torchfilter.base.ParticleFilterMeasurementModel``
    (reference subclass: crossmodal/door_models/pf.py:30-107)."""

    net: Any
    state_dim: int
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC

    def init(self, key) -> Params:
        states = jnp.zeros((1, 1, self.state_dim), jnp.float32)
        obs = example_observations(self.obs_spec)
        return self.net.init(key, states, obs)["params"]

    def log_likelihoods(
        self, params: Params, states, observations, enabled: Optional[Tuple[bool, ...]] = None
    ):
        del enabled  # single-modality-set model; fusion handled in fusion.py
        return self.net.apply({"params": params}, states, observations)

    # Precompute API: observation encoders are carry-independent, so the
    # filter scan hoists them into one big (T*N)-batched pass (TPU: turns T
    # small CNN launches into one MXU-friendly batch).
    def encode_observations(
        self, params: Params, observations, enabled: Optional[Tuple[bool, ...]] = None
    ):
        del enabled
        if hasattr(self.net, "encode_obs"):
            return self.net.apply(
                {"params": params}, observations, method="encode_obs"
            )
        # Nets without an encode/trunk split (e.g. analytic test models):
        # "features" degrade to the raw observations.
        return observations

    def log_likelihoods_from_features(
        self, params: Params, states, features, enabled: Optional[Tuple[bool, ...]] = None
    ):
        del enabled
        if hasattr(self.net, "encode_obs"):
            return self.net.apply(
                {"params": params}, states, features, method="from_features"
            )
        return self.net.apply({"params": params}, states, features)


@dataclasses.dataclass(frozen=True)
class VirtualSensorDef:
    """Wraps a virtual sensor network: observations -> (z (N, D),
    scale_tril (N, D, D)).

    Capability parity with ``torchfilter.base.VirtualSensorModel``
    (reference subclass: crossmodal/door_models/kf.py:31-126)."""

    net: Any
    state_dim: int
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC

    def init(self, key) -> Params:
        obs = example_observations(self.obs_spec)
        return self.net.init(key, obs)["params"]

    def apply(
        self, params: Params, observations, enabled: Optional[Tuple[bool, ...]] = None
    ):
        del enabled
        return self.net.apply({"params": params}, observations)


class FilterDef(abc.ABC):
    """Abstract filter definition.

    Capability parity with ``torchfilter.base.Filter`` (one-step ``forward``,
    ``forward_loop``, ``initialize_beliefs`` — reference usage:
    crossmodal/eval_helpers.py:128-142), as pure functions over an explicit
    belief carry.
    """

    state_dim: int

    @abc.abstractmethod
    def init(self, key) -> Params:
        ...

    @abc.abstractmethod
    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        ...

    @abc.abstractmethod
    def step(
        self,
        params: Params,
        belief,
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """One filter timestep: returns (new_belief, state_estimate (N, D))."""
        ...

    def forward_loop(
        self,
        params: Params,
        belief,
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """Unroll `step` over the leading time axis with lax.scan.

        observations_seq: pytree of (T, N, ...); controls_seq: (T, N, C).
        Returns (final_belief, estimates (T, N, D)).
        """
        num_steps = jax.tree_util.tree_leaves(controls_seq)[0].shape[0]
        keys = jax.random.split(key, num_steps)

        def scan_step(carry, inputs):
            obs_t, ctrl_t, key_t = inputs
            new_belief, estimate = self.step(
                params, carry, obs_t, ctrl_t, key_t, train=train, enabled=enabled
            )
            return new_belief, estimate

        final_belief, estimates = jax.lax.scan(
            scan_step, belief, (observations_seq, controls_seq, keys),
            # Concrete defs carry a scan_unroll field (serving knob
            # MMF_TPU_SCAN_UNROLL); analytic/test defs may not.
            unroll=getattr(self, "scan_unroll", 1),
        )
        return final_belief, estimates
