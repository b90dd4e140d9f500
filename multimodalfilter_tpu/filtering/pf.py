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
    # Fuse the PF step tail into one Pallas kernel (ops/pallas_pf.py):
    # eval mode fuses weight-update + estimate + (multinomial or soft)
    # resample — the multinomial small-M kernel is bitwise-identical to the
    # jnp path given the same key; train mode fuses weight-update + estimate
    # with a custom-VJP backward kernel (no resampling, matching
    # torchfilter's train default). Opt-in.
    pallas_resample: bool = False
    # lax.scan unroll factor for forward_loop. Same ops and key stream, but
    # XLA fuses across unrolled steps and may reassociate fp — deterministic
    # filters (KF/EKF/LSTM) stay bitwise-identical (tested); PFs can flip
    # tie-level resampling draws (observed max ~1e-5 estimate drift, the
    # same class as the documented large-M cumsum reassociation). At small N
    # the filter step is op-count-bound (profiled N=1: ~49 body ops x
    # ~0.16us fixed cost each — docs/PERFORMANCE.md round-4 attribution);
    # unrolling amortizes loop machinery and batches the per-step RNG
    # chains. Serving knob: MMF_TPU_SCAN_UNROLL.
    scan_unroll: int = 1
    # Hoist the per-step RNG out of forward_loop's scan: the noise/uniform
    # draws are counter-based functions of the pre-split step keys, so ONE
    # batched draw before the scan produces the bitwise-identical stream
    # (tested: tests/test_rng_hoist.py) while removing every per-step
    # threefry chain from the scan body — profiled N=1, those chains were
    # ~23% of per-step self-time (docs/PERFORMANCE.md round-4 attribution).
    hoist_rng: bool = True
    # Hoist the dynamics CONTROL encoder out of the scan: controls are
    # carry-independent (the same value is re-encoded for every particle
    # row today), so one (T*N)-batched pass before the scan replaces an
    # (N*M)-row MLP+resblock inside every step. Same math row-for-row;
    # bitwise-tested (tests/test_rng_hoist.py). Requires the dynamics net
    # to expose the split (DynamicsNet does); silently off otherwise.
    hoist_ctrl: bool = True
    # Run the ENTIRE eval forward_loop as ONE Pallas kernel (grid over
    # (N, T), belief carried in VMEM scratch, weights VMEM-resident —
    # ops/pallas_fused_step.py). Removes the ~70-tiny-ops-per-step dispatch
    # bottleneck of the N-small serving regime (round-4 attribution). Exact
    # recursion, fp-reassociated (split concat->dense layers): estimates
    # match to tolerance, tie-level resample draws can flip. Serving knob
    # (MMF_TPU_FUSED_STEP=1); unsupported configs fall back to the scan
    # path silently.
    fused_step: bool = False

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

    def _step_core(
        self, params, belief, log_lik_fn, controls, key, *, train: bool,
        eps=None, uniforms=None, ctrl_features=None,
    ):
        """One PF timestep given a log-likelihood closure over the propagated
        particles. Shared by step (inline obs) and forward_loop (hoisted
        obs-encoder features).

        `eps` (N*M, D) / `uniforms` (N, M) optionally carry PRE-DRAWN noise
        (the forward_loop hoisted-RNG path): the per-step draws are
        counter-based functions of the pre-split step keys, so one batched
        draw outside the scan produces the bitwise-identical stream while
        removing every per-step threefry chain from the scan body
        (profiled N=1: RNG was ~23% of per-step self-time)."""
        particles, log_weights = belief
        n, m, d = particles.shape
        k_resample = None
        if eps is None or (uniforms is None and not train):
            k_noise, k_resample = jax.random.split(key)

        # --- Dynamics propagation (flatten N, M into one matmul batch) ---
        flat_particles = particles.reshape(n * m, d)
        if ctrl_features is not None:
            # Hoisted control features (N, U): broadcast over particles —
            # the control encoder already ran in the pre-scan batch.
            flat_feat = jnp.repeat(ctrl_features, m, axis=0)
            pred_mean, scale_tril = self.dynamics_model.apply_with_control_features(
                params["dynamics_model"], flat_particles, flat_feat
            )
        else:
            flat_controls = jnp.repeat(controls, m, axis=0)
            pred_mean, scale_tril = self.dynamics_model.apply(
                params["dynamics_model"], flat_particles, flat_controls
            )
        if eps is None:
            eps = jax.random.normal(
                k_noise, pred_mean.shape, dtype=pred_mean.dtype
            )
        flat_new = pred_mean + jnp.einsum("bij,bj->bi", scale_tril, eps)
        particles = flat_new.reshape(n, m, d)

        # --- Measurement update ---
        log_liks = log_lik_fn(particles)

        if self.pallas_resample and self.estimation_method == "weighted_average":
            interpret = jax.default_backend() != "tpu"
            if train:
                # Fused train-mode update + estimate (custom-VJP Pallas
                # kernels both ways); no resampling during BPTT.
                from ..ops.pallas_pf import pf_update_estimate

                log_weights, estimate = pf_update_estimate(
                    log_weights, log_liks, particles, interpret
                )
                return ParticleBelief(particles, log_weights), estimate
            from ..ops.pallas_pf import CHUNKED_M_MAX, pf_update_and_resample

            # VMEM guard: the chunked kernel keeps O(M*CHUNK) intermediates;
            # beyond CHUNKED_M_MAX fall through to the jnp path.
            if m <= CHUNKED_M_MAX:
                # Fused eval path: normalize + estimate + resample in one
                # VMEM-resident kernel (multinomial or soft by alpha).
                if uniforms is None:
                    uniforms = jax.random.uniform(k_resample, (n, m))
                particles, log_weights, estimate = pf_update_and_resample(
                    log_weights, log_liks, particles, uniforms,
                    alpha=self.soft_resample_alpha, interpret=interpret,
                )
                return ParticleBelief(particles, log_weights), estimate

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
                    k_resample, particles, log_weights, uniforms=uniforms
                )
            else:
                particles, log_weights = soft_resample(
                    k_resample, particles, log_weights,
                    self.soft_resample_alpha, uniforms=uniforms,
                )

        return ParticleBelief(particles, log_weights), estimate

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
        def log_lik_fn(particles):
            return self.measurement_model.log_likelihoods(
                params["measurement_model"], particles, observations, enabled=enabled
            )

        return self._step_core(
            params, belief, log_lik_fn, controls, key, train=train
        )

    def forward_loop(
        self,
        params,
        belief: ParticleBelief,
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """TPU-optimized unroll: observation encoders (the CNN/MLP stacks —
        where the FLOPs are) are carry-independent, so they run ONCE over all
        T*N frames as one large batch before the scan; the scan body keeps
        only the recursion (dynamics + per-particle trunk + resampling)."""
        t, n = controls_seq.shape[:2]
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t * n,) + x.shape[2:]), observations_seq
        )
        features = self.measurement_model.encode_observations(
            params["measurement_model"], flat_obs, enabled=enabled
        )
        features_seq = jax.tree_util.tree_map(
            lambda x: x.reshape((t, n) + x.shape[1:]), features
        )
        keys = jax.random.split(key, t)

        ctrl_feat_seq = None
        if self.hoist_ctrl and self.dynamics_model.supports_control_hoist:
            # Control features are carry-independent: encode all T*N control
            # rows in one batch (the obs-encoder hoist, applied to the
            # dynamics side). The scan body then broadcasts (N, U) over M
            # instead of running the control MLP on (N*M) rows every step.
            flat_ctrl = controls_seq.reshape((t * n,) + controls_seq.shape[2:])
            ctrl_feat = self.dynamics_model.encode_controls(
                params["dynamics_model"], flat_ctrl
            )
            ctrl_feat_seq = ctrl_feat.reshape((t, n) + ctrl_feat.shape[1:])

        eps_seq = uni_seq = None
        if self.hoist_rng:
            # Pre-draw every step's noise in one batched op (bitwise the
            # in-scan stream — see the hoist_rng field comment). The split
            # mirrors _step_core's `jax.random.split(key)` exactly.
            pairs = jax.vmap(jax.random.split)(keys)
            k_noise_seq, k_resample_seq = pairs[:, 0], pairs[:, 1]
            m = belief.particles.shape[1]
            d = self.state_dim
            # dtype probe: eps must match the dynamics output dtype (bf16
            # under with_compute_dtype) to reproduce the in-scan draw.
            out_sds = jax.eval_shape(
                self.dynamics_model.apply,
                params["dynamics_model"],
                jax.ShapeDtypeStruct((n * m, d), belief.particles.dtype),
                jax.ShapeDtypeStruct(
                    (n * m,) + controls_seq.shape[2:], controls_seq.dtype
                ),
            )[0]
            eps_seq = jax.vmap(
                lambda k: jax.random.normal(k, (n * m, d), dtype=out_sds.dtype)
            )(k_noise_seq)
            if not train:
                uni_seq = jax.vmap(
                    lambda k: jax.random.uniform(k, (n, m))
                )(k_resample_seq)

        if (
            self.fused_step
            and not train
            and self.pallas_resample
            and eps_seq is not None
            and uni_seq is not None
        ):
            from ..ops.pallas_fused_step import try_fused_forward

            out = try_fused_forward(
                self, params, belief, features_seq, ctrl_feat_seq,
                eps_seq, uni_seq, enabled,
                interpret=jax.default_backend() != "tpu",
            )
            if out is not None:
                return out

        def scan_step(carry, inputs):
            features_t, ctrl_t, key_t, eps_t, uni_t, ctrl_feat_t = inputs

            def log_lik_fn(particles):
                return self.measurement_model.log_likelihoods_from_features(
                    params["measurement_model"], particles, features_t,
                    enabled=enabled,
                )

            return self._step_core(
                params, carry, log_lik_fn, ctrl_t, key_t, train=train,
                eps=eps_t, uniforms=uni_t, ctrl_features=ctrl_feat_t,
            )

        final_belief, estimates = jax.lax.scan(
            scan_step, belief,
            (features_seq, controls_seq, keys, eps_seq, uni_seq,
             ctrl_feat_seq),
            unroll=self.scan_unroll,
        )
        return final_belief, estimates
