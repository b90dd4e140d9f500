"""LSTM baseline filter.

Capability parity with the reference LSTM filters
(crossmodal/door_models/lstm.py:13-100, crossmodal/push_models/lstm.py): all
T*N frames are encoded in one batched pass (one big MXU matmul batch), then a
2-layer LSTM is scanned over time. ``initialize_beliefs`` zeroes the hidden
state (lstm.py:49-57); mean/covariance arguments are ignored as in the
reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import DEFAULT_OBS_SPEC, FilterDef, ObsSpec, example_observations


@dataclasses.dataclass(frozen=True)
class LSTMFilterDef(FilterDef):
    net: object  # LSTMFilterNet
    state_dim: int
    control_dim: int = 7
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    lstm_hidden_dim: int = 512
    lstm_num_layers: int = 2
    # forward_loop lax.scan unroll factor (numerics-identical; serving knob
    # MMF_TPU_SCAN_UNROLL — see ParticleFilterDef.scan_unroll).
    scan_unroll: int = 1

    def init(self, key):
        obs = example_observations(self.obs_spec)
        controls = jnp.zeros((1, self.control_dim), jnp.float32)
        carry = self._zero_carry(1)
        return self.net.init(key, obs, controls, carry)["params"]

    def _zero_carry(self, batch_size: int, dtype=jnp.float32):
        return tuple(
            (
                jnp.zeros((batch_size, self.lstm_hidden_dim), dtype),
                jnp.zeros((batch_size, self.lstm_hidden_dim), dtype),
            )
            for _ in range(self.lstm_num_layers)
        )

    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        del params, key, covariance, train
        return self._zero_carry(mean.shape[0], mean.dtype)

    def step(
        self,
        params,
        belief,
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        del key, train, enabled
        new_carry, estimate = self.net.apply(
            {"params": params}, observations, controls, belief
        )
        return new_carry, estimate

    def forward_loop(
        self,
        params,
        belief,
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """Batch-encode all (T, N) frames at once, then scan the LSTM cells."""
        del key, train, enabled
        t, n = controls_seq.shape[:2]
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t * n,) + x.shape[2:]), observations_seq
        )
        flat_controls = controls_seq.reshape((t * n,) + controls_seq.shape[2:])
        features = self.net.apply(
            {"params": params}, flat_obs, flat_controls, method="encode"
        )
        features = features.reshape(t, n, -1)

        def scan_step(carry, features_t):
            new_carry, estimate = self.net.apply(
                {"params": params}, carry, features_t, method="lstm_step"
            )
            return new_carry, estimate

        final_carry, estimates = jax.lax.scan(
            scan_step, belief, features, unroll=self.scan_unroll
        )
        return final_carry, estimates
