"""Particle resampling primitives.

The reference inherits (soft) resampling from ``torchfilter.filters.
ParticleFilter`` (never reimplements it — SURVEY §2.4). Semantics reproduced
here:

- ``soft_resample_alpha == 1.0`` (the reference default): standard multinomial
  resampling; weights reset to uniform. Non-differentiable; used in eval mode
  only (torchfilter turns resampling off in train mode by default).
- ``alpha < 1``: soft resampling per Karkus et al. (differentiable particle
  filters) — sample from the mixture ``alpha*w + (1-alpha)/M`` and reweight by
  the importance ratio, keeping gradients w.r.t. the weights.

Implementation notes (TPU): sampling is a cumulative-sum + ``searchsorted``
per batch row — O(M log M), no M×M Gumbel matrix; the gather stays on-device
inside the scan. ``systematic_resample`` is a lower-variance TPU-friendly
variant (single uniform + strided positions) offered as an opt-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_particles(particles: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """particles: (N, M, D); indices: (N, M) -> (N, M, D)."""
    return jnp.take_along_axis(particles, indices[:, :, None], axis=1)


def _sample_indices(key: jax.Array, log_weights: jnp.ndarray, uniforms=None):
    """Multinomial sampling via inverse-CDF. log_weights: (N, M) normalized."""
    n, m = log_weights.shape
    probs = jnp.exp(log_weights)
    cdf = jnp.cumsum(probs, axis=-1)
    # Guard the tail against rounding (cdf[..., -1] may be < 1.0 - eps).
    cdf = cdf / cdf[..., -1:]
    if uniforms is None:
        uniforms = jax.random.uniform(key, (n, m))
    indices = jax.vmap(jnp.searchsorted)(cdf, uniforms)
    return jnp.clip(indices, 0, m - 1)


def multinomial_resample(key, particles, log_weights, uniforms=None):
    """Standard multinomial resampling; returns uniform weights.

    `uniforms` (N, M) pre-drawn from `key` may be passed to support the
    forward_loop's hoisted-RNG path (pf.py: the per-step draws are
    counter-based functions of pre-split keys, so one batched draw outside
    the scan is bitwise the in-scan stream)."""
    n, m, _ = particles.shape
    indices = _sample_indices(key, log_weights, uniforms=uniforms)
    new_particles = _gather_particles(particles, indices)
    new_log_weights = jnp.full((n, m), -jnp.log(m), dtype=log_weights.dtype)
    return new_particles, new_log_weights


def systematic_resample(key, particles, log_weights):
    """Systematic resampling: one uniform per batch row, stratified positions.

    Lower variance than multinomial and fully vectorized; produces sorted
    indices (contiguous gathers — friendlier to TPU memory pipelines).
    """
    n, m, _ = particles.shape
    probs = jnp.exp(log_weights)
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = cdf / cdf[..., -1:]
    u0 = jax.random.uniform(key, (n, 1))
    positions = (u0 + jnp.arange(m)[None, :]) / m
    indices = jax.vmap(jnp.searchsorted)(cdf, positions)
    indices = jnp.clip(indices, 0, m - 1)
    new_particles = _gather_particles(particles, indices)
    new_log_weights = jnp.full((n, m), -jnp.log(m), dtype=log_weights.dtype)
    return new_particles, new_log_weights


def soft_resample(key, particles, log_weights, alpha: float, uniforms=None):
    """Differentiable soft resampling (sample from a mixture with a uniform,
    reweight by the importance ratio). Gradients flow through the returned
    log-weights into the input weights. `uniforms` as in
    multinomial_resample (hoisted-RNG path)."""
    n, m, _ = particles.shape
    probs = jnp.exp(log_weights)
    mixture = alpha * probs + (1.0 - alpha) / m
    log_mixture = jnp.log(mixture)
    # Sample from the mixture (indices are non-differentiable by nature).
    cdf = jnp.cumsum(mixture, axis=-1)
    cdf = cdf / cdf[..., -1:]
    if uniforms is None:
        uniforms = jax.random.uniform(key, (n, m))
    indices = jax.vmap(jnp.searchsorted)(cdf, uniforms)
    indices = jnp.clip(indices, 0, m - 1)

    new_particles = _gather_particles(particles, indices)
    gathered_log_w = jnp.take_along_axis(log_weights, indices, axis=1)
    gathered_log_mix = jnp.take_along_axis(log_mixture, indices, axis=1)
    new_log_weights = gathered_log_w - gathered_log_mix
    new_log_weights = new_log_weights - jax.scipy.special.logsumexp(
        new_log_weights, axis=1, keepdims=True
    )
    return new_particles, new_log_weights
