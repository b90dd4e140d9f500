"""Fused Pallas TPU kernel for the particle-filter inner step.

The north-star kernel (BASELINE.json): weight update (log-normalize),
weighted-mean estimate, and multinomial resampling fused into one
VMEM-resident kernel — one HBM round-trip for the whole update instead of
separate XLA ops for logsumexp / cumsum / searchsorted / gather.

Layout notes (TPU tiling):
  - particles are carried as (N, D, M): the long particle axis M sits in the
    128-wide lane dimension; the tiny state axis D in sublanes.
  - M is padded to a multiple of 128; padding slots carry log-weight -inf
    (-1e30) so their probability mass is exactly zero. N is padded to a
    multiple of 8 (the fp32 sublane tile); padded rows compute harmless
    uniform distributions and are sliced away.
  - the grid walks N in blocks of 8 rows; each grid step is fully vectorized
    over its rows (batched MXU matmuls for estimate + one-hot gather).
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
ROW_BLOCK = 8  # fp32 sublane tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pf_kernel(lw_ref, ll_ref, uniforms_ref, particles_ref,
               out_particles_ref, out_lw_ref, est_ref, *, m_real: int):
    """One ROW_BLOCK of batch rows per grid step.

    lw_ref, ll_ref, uniforms_ref: (R, M_pad)
    particles_ref:                (R, D, M_pad)
    out_particles_ref:            (R, D, M_pad)
    out_lw_ref:                   (R, M_pad)
    est_ref:                      (R, D_pad)
    """
    r, m_pad = lw_ref.shape

    # --- Weight update + normalize (log space) ---
    lw = lw_ref[:] + ll_ref[:]  # (R, M_pad); padding slots are ~ -1e30
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    probs_unnorm = jnp.exp(lw - lw_max)
    total = jnp.sum(probs_unnorm, axis=1, keepdims=True)
    probs = probs_unnorm / total  # (R, M_pad), zero on padding

    # --- Estimate: batched (R) matvec particles (R, D, M) x probs (R, M) ---
    est = jax.lax.dot_general(
        particles_ref[:], probs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, D)
    d = particles_ref.shape[1]
    # Pad lanes D -> D_pad with a concat (scatter/.at[].set is not lowerable
    # in Mosaic).
    est_ref[:] = jnp.concatenate(
        [est, jnp.zeros((r, est_ref.shape[1] - d), jnp.float32)], axis=1
    )

    # --- Multinomial resampling ---
    # Inclusive prefix sum over lanes as a triangular matmul (Mosaic has no
    # cumsum primitive; an (M x M) MXU matmul is fast at PF scales).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
    col_ids2 = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    lower_tri = (col_ids2 <= row_ids).astype(jnp.float32)  # [i,j]=1 iff j<=i
    cdf = jax.lax.dot_general(
        probs, lower_tri,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, M_pad)
    uniforms = uniforms_ref[:]
    # indices[r, j] = #(cdf[r] < u[r, j]) — vectorized inverse-CDF search.
    mask = (cdf[:, None, :] < uniforms[:, :, None]).astype(jnp.float32)
    indices = jnp.sum(mask, axis=2).astype(jnp.int32)  # (R, M_pad)
    indices = jnp.minimum(indices, m_real - 1)

    # Gather via batched one-hot matmul: (R, D, M_src) x (R, M_out, M_src).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad, m_pad), 2)
    onehot = (col_ids == indices[:, :, None]).astype(jnp.float32)
    resampled = jax.lax.dot_general(
        particles_ref[:], onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, D, M_out)
    out_particles_ref[:] = resampled

    # Uniform weights over the real slots, -inf on padding.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad), 1)
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
    n_pad = _round_up(n, ROW_BLOCK)

    def pad2(x, fill=0.0):
        return jnp.pad(
            x, ((0, n_pad - n), (0, m_pad - m)), constant_values=fill
        )

    lw = pad2(log_weights, NEG_INF)
    ll = pad2(log_liks, 0.0)
    u = pad2(uniforms, 0.0)
    parts = jnp.pad(
        particles.transpose(0, 2, 1),
        ((0, n_pad - n), (0, 0), (0, m_pad - m)),
    )  # (N_pad, D, M_pad)

    kernel = functools.partial(_pf_kernel, m_real=m)
    grid = (n_pad // ROW_BLOCK,)

    out_particles, out_lw, est = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ROW_BLOCK, d, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (ROW_BLOCK, d, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((ROW_BLOCK, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lw, ll, u, parts)

    return (
        out_particles[:n, :, :m].transpose(0, 2, 1),
        out_lw[:n, :m],
        est[:n, :d],
    )
