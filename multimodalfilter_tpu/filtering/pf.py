"""Differentiable particle filter.

Capability parity with ``torchfilter.filters.ParticleFilter`` as used by the
reference (crossmodal/door_models/pf.py:14-27: 30 particles train / 300 eval;
soft resampling semantics inherited — SURVEY §2.4), re-designed as a pure
scan step:

  propagate particles through dynamics (+ Gaussian noise from scale_tril)
  -> per-particle measurement log-likelihoods
  -> weight update + log-normalize
  -> weighted-mean estimate (computed BEFORE resampling, matching torchfilter)
  -> (eval only, alpha==1) multinomial resample / (alpha<1) soft resample

The particle axis M is fused with batch N into one (N*M, ...) axis for the
dynamics network — a single large MXU-friendly matmul batch instead of a
Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.resampling import multinomial_resample, soft_resample
from ..types import ParticleBelief
from .base import DEFAULT_OBS_SPEC, DynamicsDef, FilterDef, ObsSpec


@dataclasses.dataclass(frozen=True)
class ParticleFilterDef(FilterDef):
    dynamics_model: DynamicsDef
    measurement_model: object  # MeasurementDef or CrossmodalPFMeasurementDef
    state_dim: int
    control_dim: int = 7
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    num_particles_train: int = 30
    num_particles_eval: int = 300
    soft_resample_alpha: float = 1.0
    estimation_method: str = "weighted_average"

    def num_particles(self, train: bool) -> int:
        # Matches DoorParticleFilter.train() (pf.py:24-27): 30 train, 300 eval.
        return self.num_particles_train if train else self.num_particles_eval

    def init(self, key):
        k_dyn, k_meas = jax.random.split(key)
        return {
            "dynamics_model": self.dynamics_model.init(k_dyn),
            "measurement_model": self.measurement_model.init(k_meas),
        }

    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        """Sample particles ~ N(mean, covariance); uniform log-weights."""
        del params
        n, d = mean.shape
        m = self.num_particles(train)
        chol = jnp.linalg.cholesky(covariance)
        eps = jax.random.normal(key, (n, m, d), dtype=mean.dtype)
        particles = mean[:, None, :] + jnp.einsum("nij,nmj->nmi", chol, eps)
        log_weights = jnp.full((n, m), -jnp.log(m), dtype=mean.dtype)
        return ParticleBelief(particles, log_weights)

    def step(
        self,
        params,
        belief: ParticleBelief,
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        particles, log_weights = belief
        n, m, d = particles.shape
        k_noise, k_resample = jax.random.split(key)

        # --- Dynamics propagation (flatten N, M into one matmul batch) ---
        flat_particles = particles.reshape(n * m, d)
        flat_controls = jnp.repeat(controls, m, axis=0)
        pred_mean, scale_tril = self.dynamics_model.apply(
            params["dynamics_model"], flat_particles, flat_controls
        )
        eps = jax.random.normal(k_noise, pred_mean.shape, dtype=pred_mean.dtype)
        flat_new = pred_mean + jnp.einsum("bij,bj->bi", scale_tril, eps)
        particles = flat_new.reshape(n, m, d)

        # --- Measurement update ---
        log_liks = self.measurement_model.log_likelihoods(
            params["measurement_model"], particles, observations, enabled=enabled
        )
        log_weights = log_weights + log_liks
        log_weights = log_weights - jax.scipy.special.logsumexp(
            log_weights, axis=1, keepdims=True
        )

        # --- Estimate (before resampling, matching torchfilter) ---
        assert self.estimation_method == "weighted_average"
        estimate = jnp.einsum("nm,nmd->nd", jnp.exp(log_weights), particles)

        # --- Resampling: on in eval, off in train (torchfilter resample=None
        # default semantics — gradients flow through weights during BPTT) ---
        if not train:
            if self.soft_resample_alpha >= 1.0:
                particles, log_weights = multinomial_resample(
                    k_resample, particles, log_weights
                )
            else:
                particles, log_weights = soft_resample(
                    k_resample, particles, log_weights, self.soft_resample_alpha
                )

        return ParticleBelief(particles, log_weights), estimate
