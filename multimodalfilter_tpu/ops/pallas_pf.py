"""Fused Pallas TPU kernels for the particle-filter inner step.

The north-star kernel (BASELINE.json): weight update (log-normalize),
weighted-mean estimate, and resampling fused into one VMEM-resident kernel —
one HBM round-trip for the whole update instead of separate XLA ops for
logsumexp / cumsum / searchsorted / gather.

Four kernels cover the PF hot paths (matching the torchfilter PF recursion
the reference inherits — /root/reference/crossmodal/door_models/pf.py:14-27):

  1. ``_pf_kernel`` — eval mode, multinomial resampling, M <= SMALL_M_MAX.
     The original round-1 kernel, bitwise-identical to the jnp path given
     the same uniforms (CLAUDE.md invariant) — kept frozen.
  2. ``_pf_soft_kernel`` — eval mode, soft resampling (alpha < 1, Karkus
     et al. semantics matching ops/resampling.py:soft_resample).
  3. ``_pf_kernel_chunked`` — eval mode, multinomial or soft, for large M:
     the O(M^2) full-matrix cumsum / inverse-CDF compare / one-hot gather
     intermediates are replaced by CHUNK-sized tiles walked with fori_loop,
     so VMEM stays O(M*CHUNK) and the M<=1024 guard lifts to ~16k.
  4. ``pf_update_estimate`` — TRAIN mode (no resampling): fused weight
     update + log-normalize + weighted-mean estimate with a custom VJP whose
     backward pass is also a single fused kernel, so the e2e BPTT training
     loop (train/loops.py) can use it.

Layout notes (TPU tiling):
  - particles are carried as (N, D, M): the long particle axis M sits in the
    128-wide lane dimension; the tiny state axis D in sublanes.
  - M is padded to a multiple of 128 (small kernels) or CHUNK (chunked
    kernel); padding slots carry log-weight -inf (-1e30) so their
    probability mass is exactly zero. N is padded to a multiple of 8 (the
    fp32 sublane tile); padded rows compute harmless uniform distributions
    and are sliced away.
  - the grid walks N in blocks of 8 rows; each grid step is fully vectorized
    over its rows (batched MXU matmuls for estimate + one-hot gather).
  - the resampling gather is a one-hot matmul on the MXU, which for PF-scale
    M is cheaper than a serial gather on TPU.
  - resampling uniforms are generated outside the kernel with jax.random
    (keeps the kernel testable in CPU interpret mode and bit-comparable with
    the jnp reference path).

The jnp reference path (ops/resampling.py) remains the default; the kernels
are opt-in via ParticleFilterDef(pallas_resample=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
ROW_BLOCK = 8  # fp32 sublane tile
SMALL_M_MAX = 1024  # full-matrix kernels above this switch to the chunked one
CHUNK = 256  # tile width for the chunked kernel (multiple of 128)
CHUNKED_M_MAX = 16384  # VMEM guard for the chunked kernel (~9 MB at D=3)


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


def _pf_soft_kernel(lw_ref, ll_ref, uniforms_ref, particles_ref,
                    out_particles_ref, out_lw_ref, est_ref,
                    *, m_real: int, alpha: float):
    """Small-M soft-resampling variant (alpha < 1, one ROW_BLOCK per grid
    step). Semantics mirror ops/resampling.py:soft_resample — sample from the
    mixture alpha*w + (1-alpha)/M, reweight by the importance ratio, then
    log-normalize — given the same uniforms."""
    r, m_pad = lw_ref.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad), 1)
    real = lane_ids < m_real

    # --- Weight update + normalize (log space) ---
    lw = lw_ref[:] + ll_ref[:]
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    shifted = jnp.exp(lw - lw_max)
    total = jnp.sum(shifted, axis=1, keepdims=True)
    probs = shifted / total  # (R, M_pad), ~zero on padding
    lw_norm = lw - lw_max - jnp.log(total)  # normalized log-weights

    # --- Estimate (before resampling) ---
    est = jax.lax.dot_general(
        particles_ref[:], probs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = particles_ref.shape[1]
    est_ref[:] = jnp.concatenate(
        [est, jnp.zeros((r, est_ref.shape[1] - d), jnp.float32)], axis=1
    )

    # --- Soft resampling: sample from mixture, reweight by importance ---
    mixture = jnp.where(real, alpha * probs + (1.0 - alpha) / m_real, 0.0)
    log_mixture = jnp.where(real, jnp.log(mixture), NEG_INF)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
    col_ids2 = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    lower_tri = (col_ids2 <= row_ids).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        mixture, lower_tri,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, M_pad)
    # jnp path compares u against cdf / cdf[-1]; compare cdf < u * cdf_last
    # instead (same predicate without a full-row divide).
    cdf_last = jnp.sum(mixture, axis=1, keepdims=True)
    u_scaled = uniforms_ref[:] * cdf_last
    mask = (cdf[:, None, :] < u_scaled[:, :, None]).astype(jnp.float32)
    indices = jnp.sum(mask, axis=2).astype(jnp.int32)
    indices = jnp.minimum(indices, m_real - 1)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad, m_pad), 2)
    onehot = (col_ids == indices[:, :, None]).astype(jnp.float32)
    out_particles_ref[:] = jax.lax.dot_general(
        particles_ref[:], onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # Importance reweight: gather lw_norm and log_mixture at the sampled
    # indices (one-hot matvec gathers are exact — single nonzero per row).
    gathered_lw = jax.lax.dot_general(
        onehot, lw_norm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, M_out)
    gathered_lmix = jax.lax.dot_general(
        onehot, log_mixture,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    new_lw = jnp.where(real, gathered_lw - gathered_lmix, NEG_INF)
    nl_max = jnp.max(new_lw, axis=1, keepdims=True)
    nl_total = jnp.sum(jnp.exp(new_lw - nl_max), axis=1, keepdims=True)
    out_lw_ref[:] = jnp.where(
        real, new_lw - nl_max - jnp.log(nl_total), NEG_INF
    )


def _pf_kernel_chunked(lw_ref, ll_ref, uniforms_ref, particles_ref,
                       out_particles_ref, out_lw_ref, est_ref,
                       mix_ref, cdf_ref, lwn_ref, lmix_ref,
                       *, m_real: int, alpha: float, chunk: int):
    """Large-M kernel: same math as the full-matrix kernels but every O(M^2)
    intermediate (triangular-matmul cumsum, inverse-CDF compare, one-hot
    gather) is tiled into (chunk x chunk) blocks walked with fori_loop, so
    VMEM usage is O(M*chunk) instead of O(M^2). Handles both multinomial
    (alpha >= 1) and soft (alpha < 1) resampling."""
    r, m_pad = lw_ref.shape
    n_chunks = m_pad // chunk
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad), 1)
    real = lane_ids < m_real

    # --- Weight update + normalize (full-row O(M) work) ---
    lw = lw_ref[:] + ll_ref[:]
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    shifted = jnp.exp(lw - lw_max)
    total = jnp.sum(shifted, axis=1, keepdims=True)
    probs = shifted / total
    lwn_ref[:] = lw - lw_max - jnp.log(total)

    # --- Estimate (O(M*D) matvec on full rows) ---
    est = jax.lax.dot_general(
        particles_ref[:], probs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = particles_ref.shape[1]
    est_ref[:] = jnp.concatenate(
        [est, jnp.zeros((r, est_ref.shape[1] - d), jnp.float32)], axis=1
    )

    # --- Resampling distribution ---
    if alpha >= 1.0:
        mix_ref[:] = probs
        lmix_ref[:] = jnp.zeros_like(probs)  # unused
    else:
        mixture = jnp.where(real, alpha * probs + (1.0 - alpha) / m_real, 0.0)
        mix_ref[:] = mixture
        lmix_ref[:] = jnp.where(real, jnp.log(mixture), NEG_INF)

    # --- Chunked inclusive prefix sum: per-chunk triangular matmul plus a
    # running row offset carried through the loop ---
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col_ids2 = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    lower_tri = (col_ids2 <= row_ids).astype(jnp.float32)

    def cumsum_body(i, offset):
        start = pl.multiple_of(i * chunk, chunk)
        pc = mix_ref[:, pl.ds(start, chunk)]
        cdf_c = jax.lax.dot_general(
            pc, lower_tri,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cdf_ref[:, pl.ds(start, chunk)] = cdf_c + offset
        return offset + jnp.sum(pc, axis=1, keepdims=True)

    cdf_last = jax.lax.fori_loop(
        0, n_chunks, cumsum_body, jnp.zeros((r, 1), jnp.float32)
    )

    # --- Per-output-chunk: count-based inverse-CDF search + one-hot gather,
    # each accumulated over source chunks ---
    def out_body(j, _):
        out_start = pl.multiple_of(j * chunk, chunk)
        u_scaled = uniforms_ref[:, pl.ds(out_start, chunk)] * cdf_last  # (R, C)

        def count_body(i, cnt):
            start = pl.multiple_of(i * chunk, chunk)
            cdf_c = cdf_ref[:, pl.ds(start, chunk)]
            mask = (cdf_c[:, None, :] < u_scaled[:, :, None]).astype(jnp.float32)
            return cnt + jnp.sum(mask, axis=2)

        counts = jax.lax.fori_loop(
            0, n_chunks, count_body, jnp.zeros((r, chunk), jnp.float32)
        )
        indices = jnp.minimum(counts.astype(jnp.int32), m_real - 1)  # global

        def gather_body(i, acc):
            start = pl.multiple_of(i * chunk, chunk)
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (r, chunk, chunk), 2) + start
            )
            onehot = (col == indices[:, :, None]).astype(jnp.float32)
            pc = particles_ref[:, :, pl.ds(start, chunk)]  # (R, D, C)
            resampled, gath_lw, gath_lmix = acc
            resampled = resampled + jax.lax.dot_general(
                pc, onehot,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            if alpha < 1.0:
                lwn_c = lwn_ref[:, pl.ds(start, chunk)]
                lmix_c = lmix_ref[:, pl.ds(start, chunk)]
                gath_lw = gath_lw + jax.lax.dot_general(
                    onehot, lwn_c,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                gath_lmix = gath_lmix + jax.lax.dot_general(
                    onehot, lmix_c,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return resampled, gath_lw, gath_lmix

        init = (
            jnp.zeros((r, d, chunk), jnp.float32),
            jnp.zeros((r, chunk), jnp.float32),
            jnp.zeros((r, chunk), jnp.float32),
        )
        resampled, gath_lw, gath_lmix = jax.lax.fori_loop(
            0, n_chunks, gather_body, init
        )
        out_particles_ref[:, :, pl.ds(out_start, chunk)] = resampled
        if alpha < 1.0:
            # Unnormalized importance weights; normalized in a final pass.
            out_lw_ref[:, pl.ds(out_start, chunk)] = gath_lw - gath_lmix
        return 0

    jax.lax.fori_loop(0, n_chunks, out_body, 0)

    # --- Output weights ---
    if alpha >= 1.0:
        out_lw_ref[:] = jnp.where(real, -jnp.log(float(m_real)), NEG_INF)
    else:
        new_lw = jnp.where(real, out_lw_ref[:], NEG_INF)
        nl_max = jnp.max(new_lw, axis=1, keepdims=True)
        nl_total = jnp.sum(jnp.exp(new_lw - nl_max), axis=1, keepdims=True)
        out_lw_ref[:] = jnp.where(
            real, new_lw - nl_max - jnp.log(nl_total), NEG_INF
        )


def _pallas_resample_call(kernel, n, m, d, m_align, lw, ll, u, parts,
                          scratch_shapes, interpret):
    """Shared pad + pallas_call plumbing for the three resampling kernels."""
    m_pad = _round_up(m, m_align)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, ROW_BLOCK)

    def pad2(x, fill=0.0):
        return jnp.pad(x, ((0, n_pad - n), (0, m_pad - m)), constant_values=fill)

    lw = pad2(lw, NEG_INF)
    ll = pad2(ll, 0.0)
    u = pad2(u, 0.0)
    parts = jnp.pad(
        parts.transpose(0, 2, 1), ((0, n_pad - n), (0, 0), (0, m_pad - m))
    )  # (N_pad, D, M_pad)

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
        scratch_shapes=scratch_shapes(m_pad),
        interpret=interpret,
    )(lw, ll, u, parts)

    return (
        out_particles[:n, :, :m].transpose(0, 2, 1),
        out_lw[:n, :m],
        est[:n, :d],
    )


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def pf_update_and_resample(log_weights, log_liks, particles, uniforms, *,
                           alpha: float = 1.0, interpret=False):
    """Fused PF measurement update + estimate + resample (eval mode).

    Args:
      log_weights: (N, M) normalized previous log-weights.
      log_liks:    (N, M) measurement log-likelihoods.
      particles:   (N, M, D) propagated particles.
      uniforms:    (N, M) U(0,1) resampling draws (jax.random.uniform).
      alpha:       soft-resampling alpha; >= 1.0 selects multinomial.

    Returns: (particles' (N, M, D), log_weights' (N, M), estimate (N, D)).

    Dispatch: full-matrix kernels for M <= SMALL_M_MAX (the multinomial one
    bitwise-identical to the jnp path), the chunked kernel above that up to
    CHUNKED_M_MAX (caller falls back to jnp beyond).
    """
    n, m, d = particles.shape
    if m <= SMALL_M_MAX:
        if alpha >= 1.0:
            kernel = functools.partial(_pf_kernel, m_real=m)
        else:
            kernel = functools.partial(_pf_soft_kernel, m_real=m, alpha=alpha)
        return _pallas_resample_call(
            kernel, n, m, d, 128, log_weights, log_liks, uniforms, particles,
            lambda m_pad: [], interpret,
        )
    kernel = functools.partial(
        _pf_kernel_chunked, m_real=m, alpha=alpha, chunk=CHUNK
    )
    return _pallas_resample_call(
        kernel, n, m, d, CHUNK, log_weights, log_liks, uniforms, particles,
        lambda m_pad: [
            pltpu.VMEM((ROW_BLOCK, m_pad), jnp.float32),  # mixture
            pltpu.VMEM((ROW_BLOCK, m_pad), jnp.float32),  # cdf
            pltpu.VMEM((ROW_BLOCK, m_pad), jnp.float32),  # normalized log-w
            pltpu.VMEM((ROW_BLOCK, m_pad), jnp.float32),  # log mixture
        ],
        interpret,
    )


# ---------------------------------------------------------------------------
# Train-mode fused update + estimate (no resampling) with custom VJP
# ---------------------------------------------------------------------------


def _pf_estimate_fwd_kernel(lw_ref, ll_ref, particles_ref, out_lw_ref, est_ref,
                            *, m_real: int):
    """Fused weight update + log-normalize + weighted-mean estimate (the
    train-mode PF step tail — torchfilter keeps resampling off during BPTT)."""
    r, m_pad = lw_ref.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (r, m_pad), 1)

    lw = lw_ref[:] + ll_ref[:]
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    shifted = jnp.exp(lw - lw_max)
    total = jnp.sum(shifted, axis=1, keepdims=True)
    probs = shifted / total
    out_lw_ref[:] = jnp.where(
        lane_ids < m_real, lw - lw_max - jnp.log(total), NEG_INF
    )

    est = jax.lax.dot_general(
        particles_ref[:], probs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = particles_ref.shape[1]
    est_ref[:] = jnp.concatenate(
        [est, jnp.zeros((r, est_ref.shape[1] - d), jnp.float32)], axis=1
    )


def _pf_estimate_bwd_kernel(lwn_ref, particles_ref, est_ref, glw_ref, gest_ref,
                            gs_ref, gparticles_ref, *, d: int):
    """Fused backward pass. With s = lw + ll, lw' = s - logsumexp(s),
    p = exp(lw'), est = sum_m p_m x_m:

      g_s      = g_lw' - p * sum(g_lw') + p * (x . g_est - est . g_est)
      g_x[m,d] = p[m] * g_est[d]

    and g_lw = g_ll = g_s. Padding lanes have p = 0 and zero cotangents, so
    they contribute nothing."""
    p = jnp.exp(lwn_ref[:])  # (R, M_pad); exp(-1e30) == 0 on padding
    gest = gest_ref[:, :d]  # (R, D) static slice off the lane padding

    gparticles_ref[:] = p[:, None, :] * gest[:, :, None]

    # x . g_est contracts the tiny sublane axis D — Mosaic's matmul requires
    # the contraction on the last dim, so do it as a broadcasted
    # multiply-reduce on the VPU (D <= 8; still O(M*D) work).
    xg = jnp.sum(particles_ref[:] * gest[:, :, None], axis=1)  # (R, M_pad)
    eg = jnp.sum(est_ref[:, :d] * gest, axis=1, keepdims=True)  # (R, 1)
    sum_glw = jnp.sum(glw_ref[:], axis=1, keepdims=True)
    gs_ref[:] = glw_ref[:] - p * sum_glw + p * (xg - eg)


def _estimate_row_specs(m_pad):
    return pl.BlockSpec((ROW_BLOCK, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _estimate_parts_specs(d, m_pad):
    return pl.BlockSpec(
        (ROW_BLOCK, d, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )


def _pf_estimate_fwd_impl(log_weights, log_liks, particles, interpret):
    n, m, d = particles.shape
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, ROW_BLOCK)

    lw = jnp.pad(log_weights, ((0, n_pad - n), (0, m_pad - m)), constant_values=NEG_INF)
    ll = jnp.pad(log_liks, ((0, n_pad - n), (0, m_pad - m)))
    parts = jnp.pad(
        particles.transpose(0, 2, 1), ((0, n_pad - n), (0, 0), (0, m_pad - m))
    )

    out_lw, est = pl.pallas_call(
        functools.partial(_pf_estimate_fwd_kernel, m_real=m),
        grid=(n_pad // ROW_BLOCK,),
        in_specs=[
            _estimate_row_specs(m_pad),
            _estimate_row_specs(m_pad),
            _estimate_parts_specs(d, m_pad),
        ],
        out_specs=[
            _estimate_row_specs(m_pad),
            pl.BlockSpec((ROW_BLOCK, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lw, ll, parts)
    return out_lw[:n, :m], est[:n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pf_update_estimate(log_weights, log_liks, particles, interpret=False):
    """Fused train-mode PF update: (lw, ll, particles) ->
    (normalized log-weights, weighted-mean estimate). No resampling —
    matching torchfilter's train-mode default (resample=None), so gradients
    flow through the weights during BPTT. Forward AND backward are single
    fused Pallas kernels (custom VJP)."""
    return _pf_estimate_fwd_impl(log_weights, log_liks, particles, interpret)


def _pf_estimate_vjp_fwd(log_weights, log_liks, particles, interpret):
    out_lw, est = _pf_estimate_fwd_impl(log_weights, log_liks, particles, interpret)
    return (out_lw, est), (out_lw, particles, est)


def _pf_estimate_vjp_bwd(interpret, residuals, cotangents):
    out_lw, particles, est = residuals
    g_lw, g_est = cotangents
    n, m, d = particles.shape
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, ROW_BLOCK)

    lwn = jnp.pad(out_lw, ((0, n_pad - n), (0, m_pad - m)), constant_values=NEG_INF)
    parts = jnp.pad(
        particles.transpose(0, 2, 1), ((0, n_pad - n), (0, 0), (0, m_pad - m))
    )
    est_p = jnp.pad(est, ((0, n_pad - n), (0, d_pad - d)))
    glw = jnp.pad(g_lw, ((0, n_pad - n), (0, m_pad - m)))
    gest = jnp.pad(g_est, ((0, n_pad - n), (0, d_pad - d)))

    gs, gparts = pl.pallas_call(
        functools.partial(_pf_estimate_bwd_kernel, d=d),
        grid=(n_pad // ROW_BLOCK,),
        in_specs=[
            _estimate_row_specs(m_pad),
            _estimate_parts_specs(d, m_pad),
            pl.BlockSpec((ROW_BLOCK, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _estimate_row_specs(m_pad),
            pl.BlockSpec((ROW_BLOCK, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _estimate_row_specs(m_pad),
            _estimate_parts_specs(d, m_pad),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(lwn, parts, est_p, glw, gest)

    g_s = gs[:n, :m]
    g_particles = gparts[:n, :, :m].transpose(0, 2, 1)
    return g_s, g_s, g_particles


pf_update_estimate.defvjp(_pf_estimate_vjp_fwd, _pf_estimate_vjp_bwd)
