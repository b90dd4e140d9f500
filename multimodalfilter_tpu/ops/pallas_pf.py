"""Fused Pallas TPU kernel for the particle-filter inner step.

The north-star kernel (BASELINE.json): weight update (log-normalize),
weighted-mean estimate, and multinomial resampling fused into one
VMEM-resident kernel — one HBM round-trip for the whole update instead of
separate XLA ops for logsumexp / cumsum / searchsorted / gather.

Layout notes (TPU tiling):
  - particles are carried as (N, D, M): the long particle axis M sits in the
    128-wide lane dimension; the tiny state axis D in sublanes.
  - M is padded to a multiple of 128 by the wrapper; padding slots carry
    log-weight -inf (-1e30) so their probability mass is exactly zero.
  - the resampling gather is a one-hot matmul on the MXU (M x M), which for
    PF-scale M (hundreds) is cheaper than a serial gather on TPU.
  - resampling uniforms are generated outside the kernel with jax.random
    (keeps the kernel testable in CPU interpret mode and bit-comparable with
    the jnp reference path).

The jnp reference path (ops/resampling.py) remains the default; this kernel
is opt-in via ParticleFilterDef(pallas_resample=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pf_kernel(lw_ref, ll_ref, uniforms_ref, particles_ref,
               out_particles_ref, out_lw_ref, est_ref, *, m_real: int):
    """One batch row per grid step.

    lw_ref, ll_ref:      (1, M_pad)   previous log-weights, log-likelihoods
    uniforms_ref:        (1, M_pad)   U(0,1) resampling draws
    particles_ref:       (D, M_pad)
    out_particles_ref:   (D, M_pad)
    out_lw_ref:          (1, M_pad)
    est_ref:             (1, D_pad)   weighted-mean estimate (padded lanes)
    """
    m_pad = lw_ref.shape[1]

    # --- Weight update + normalize (log space) ---
    lw = lw_ref[:] + ll_ref[:]  # (1, M_pad); padding slots are ~ -1e30
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    probs_unnorm = jnp.exp(lw - lw_max)
    total = jnp.sum(probs_unnorm, axis=1, keepdims=True)
    probs = probs_unnorm / total  # (1, M_pad), zero on padding

    # --- Estimate: particles (D, M) @ probs (M,) on the MXU ---
    est = jax.lax.dot_general(
        particles_ref[:], probs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, 1)
    d = particles_ref.shape[0]
    est_ref[0, :] = jnp.zeros((est_ref.shape[1],), jnp.float32)
    est_ref[0, 0:d] = est[:, 0]

    # --- Multinomial resampling ---
    cdf = jnp.cumsum(probs, axis=1)  # (1, M_pad)
    uniforms = uniforms_ref[:]
    # indices[j] = #(cdf < u_j) — a vectorized inverse-CDF search.
    mask = (cdf[0, None, :] < uniforms[0, :, None]).astype(jnp.float32)  # (M, M)
    indices = jnp.sum(mask, axis=1).astype(jnp.int32)  # (M,)
    indices = jnp.minimum(indices, m_real - 1)

    # Gather via one-hot matmul: onehot (M_out, M_src) @ particles^T.
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    onehot = (col_ids == indices[:, None]).astype(jnp.float32)
    resampled = jax.lax.dot_general(
        particles_ref[:], onehot,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, M_out)
    out_particles_ref[:] = resampled

    # Uniform weights over the real slots, -inf on padding.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    out_lw_ref[:] = jnp.where(
        lane_ids < m_real, -jnp.log(float(m_real)), NEG_INF
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pf_update_and_resample(log_weights, log_liks, particles, uniforms, *, interpret=False):
    """Fused PF measurement update + estimate + multinomial resample.

    Args:
      log_weights: (N, M) normalized previous log-weights.
      log_liks:    (N, M) measurement log-likelihoods.
      particles:   (N, M, D) propagated particles.
      uniforms:    (N, M) U(0,1) resampling draws (jax.random.uniform).

    Returns: (particles' (N, M, D), log_weights' (N, M), estimate (N, D)).
    """
    n, m, d = particles.shape
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)

    lw = jnp.pad(log_weights, ((0, 0), (0, m_pad - m)), constant_values=NEG_INF)
    ll = jnp.pad(log_liks, ((0, 0), (0, m_pad - m)), constant_values=0.0)
    u = jnp.pad(uniforms, ((0, 0), (0, m_pad - m)), constant_values=0.0)
    parts = jnp.pad(
        particles.transpose(0, 2, 1), ((0, 0), (0, 0), (0, m_pad - m))
    )  # (N, D, M_pad)

    def kernel_3d(lw_ref, ll_ref, u_ref, parts_ref, out_p_ref, out_lw_ref, est_ref):
        _pf_kernel(
            lw_ref, ll_ref, u_ref, parts_ref[0], out_p_ref.at[0], out_lw_ref,
            est_ref, m_real=m,
        )

    out_particles, out_lw, est = pl.pallas_call(
        kernel_3d,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, d, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lw, ll, u, parts)

    return (
        out_particles[:, :, :m].transpose(0, 2, 1),
        out_lw[:, :m],
        est[:, :d],
    )
