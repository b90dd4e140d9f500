"""Virtual-sensor extended Kalman filter.

Capability parity with ``torchfilter.filters.VirtualSensorExtendedKalmanFilter``
as used by the reference (crossmodal/base_models/crossmodal_kf.py:45,147-149,
178-186,211-215; crossmodal/door_models/kf.py:14-28):

  predict:  F = d(dynamics mean)/d(state)   [jax.jacfwd, batched via vmap]
            mean' = dynamics(mean);  cov' = F cov F^T + Q (Q = L L^T)
  update:   virtual sensor -> (z, R_tril); observation model is identity:
            S = cov' + R,  K = cov' S^{-1}  (Cholesky solve),
            mean <- mean' + K (z - mean'),  cov <- (I - K) cov'

The belief (mean, cov) is the scan carry — the reference's mutable
``states_prev`` / ``_belief_covariance`` attributes (crossmodal_kf.py:147-149)
become explicit state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import GaussianBelief
from .base import DEFAULT_OBS_SPEC, DynamicsDef, FilterDef, ObsSpec, VirtualSensorDef


def _kalman_update(pred_mean, pred_cov, z, r_tril):
    """Identity-observation Kalman update, batched over N."""
    r = r_tril @ jnp.swapaxes(r_tril, -1, -2)
    s = pred_cov + r
    # K = pred_cov @ S^{-1}; with S symmetric PSD use a Cholesky solve:
    # solve(S, pred_cov) = S^{-1} pred_cov, and K = (S^{-1} pred_cov)^T since
    # pred_cov is symmetric.
    chol = jnp.linalg.cholesky(s)
    k = jnp.swapaxes(jax.scipy.linalg.cho_solve((chol, True), pred_cov), -1, -2)
    innovation = z - pred_mean
    mean = pred_mean + jnp.einsum("nij,nj->ni", k, innovation)
    eye = jnp.eye(pred_cov.shape[-1], dtype=pred_cov.dtype)
    cov = (eye - k) @ pred_cov
    # Symmetrize for numerical stability under long scans (the (I-K)P form
    # drifts asymmetric in fp32; this does not change the math).
    cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    return mean, cov


@dataclasses.dataclass(frozen=True)
class VirtualSensorEKFDef(FilterDef):
    dynamics_model: DynamicsDef
    virtual_sensor_model: VirtualSensorDef
    state_dim: int
    control_dim: int = 7
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    # forward_loop lax.scan unroll factor (numerics-identical; serving knob
    # MMF_TPU_SCAN_UNROLL — see ParticleFilterDef.scan_unroll).
    scan_unroll: int = 1
    # Hoist the dynamics control encoder out of the forward_loop scan: the
    # control MLP is carry-independent, so it runs once over all T*N rows
    # instead of once per scan step. Bitwise-identical row math (the jacfwd
    # tangent path never touches the control branch — controls carry no
    # tangents either way); tests/test_ekf_hoist.py. Mirrors
    # ParticleFilterDef.hoist_ctrl.
    hoist_ctrl: bool = True

    def init(self, key):
        k_dyn, k_vs = jax.random.split(key)
        return {
            "dynamics_model": self.dynamics_model.init(k_dyn),
            "virtual_sensor_model": self.virtual_sensor_model.init(k_vs),
        }

    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        del params, key, train
        return GaussianBelief(mean, covariance)

    def measurement_initialize_beliefs(self, params, observations, *, key=None, train=False):
        """Belief from the virtual sensor alone: mean = z, cov = R."""
        z, r_tril = self.virtual_sensor_model.apply(
            params["virtual_sensor_model"], observations
        )
        cov = r_tril @ jnp.swapaxes(r_tril, -1, -2)
        return GaussianBelief(z, cov)

    def predict(self, params, belief: GaussianBelief, controls, *,
                ctrl_feat=None):
        """EKF predict step (exposed for fusion filters).

        When ``ctrl_feat`` is given (hoisted control features, see
        ``precompute_control_features``), the dynamics runs its
        carry-dependent remainder only; ``controls`` is ignored. The
        Jacobian is with respect to the state either way — the control
        branch is a constant under ``jacfwd`` — so the two paths are
        bitwise-identical per row.
        """
        mean, cov = belief
        dyn_params = params["dynamics_model"]

        if ctrl_feat is None:

            def mean_fn(s, c):
                new, tril = self.dynamics_model.apply(
                    dyn_params, s[None], c[None]
                )
                return new[0], (new[0], tril[0])

            ctrl_in = controls
        else:

            def mean_fn(s, cf):
                new, tril = self.dynamics_model.apply_with_control_features(
                    dyn_params, s[None], cf[None]
                )
                return new[0], (new[0], tril[0])

            ctrl_in = ctrl_feat

        jac_fn = jax.jacfwd(mean_fn, has_aux=True)
        f, (pred_mean, q_tril) = jax.vmap(jac_fn)(mean, ctrl_in)
        q = q_tril @ jnp.swapaxes(q_tril, -1, -2)
        pred_cov = f @ cov @ jnp.swapaxes(f, -1, -2) + q
        return pred_mean, pred_cov

    def update_from_virtual(self, params, belief: GaussianBelief, z, r_tril,
                            controls, *, ctrl_feat=None):
        """Predict + update given a precomputed virtual measurement."""
        pred_mean, pred_cov = self.predict(
            params, belief, controls, ctrl_feat=ctrl_feat
        )
        mean, cov = _kalman_update(pred_mean, pred_cov, z, r_tril)
        return GaussianBelief(mean, cov), mean

    def precompute_control_features(self, params, controls_seq):
        """(T, N, C) controls -> (T, N, U) hoisted control features, or
        ``None`` when hoisting is off/unsupported. One batched MLP pass
        replaces T in-scan passes (same row math — matmul reductions run
        over the feature axis only)."""
        if not (
            self.hoist_ctrl and self.dynamics_model.supports_control_hoist
        ):
            return None
        t, n = controls_seq.shape[:2]
        flat = controls_seq.reshape((t * n,) + controls_seq.shape[2:])
        cf = self.dynamics_model.encode_controls(
            params["dynamics_model"], flat
        )
        return cf.reshape((t, n) + cf.shape[1:])

    def step(
        self,
        params,
        belief: GaussianBelief,
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        del key, train
        z, r_tril = self.virtual_sensor_model.apply(
            params["virtual_sensor_model"], observations, enabled=enabled
        )
        return self.update_from_virtual(params, belief, z, r_tril, controls)

    def precompute_virtual(self, params, observations_seq, enabled=None):
        """Run the virtual sensor over all (T, N) frames as one batch —
        it is carry-independent, so it never belongs inside the scan."""
        leaf = jax.tree_util.tree_leaves(observations_seq)[0]
        t, n = leaf.shape[:2]
        flat_obs = jax.tree_util.tree_map(
            lambda x: x.reshape((t * n,) + x.shape[2:]), observations_seq
        )
        z, r_tril = self.virtual_sensor_model.apply(
            params["virtual_sensor_model"], flat_obs, enabled=enabled
        )
        return (
            z.reshape((t, n) + z.shape[1:]),
            r_tril.reshape((t, n) + r_tril.shape[1:]),
        )

    def forward_loop(
        self,
        params,
        belief: GaussianBelief,
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """TPU-optimized unroll: virtual sensor hoisted out of the scan; the
        scan body is pure small-matrix EKF algebra."""
        del key, train
        z_seq, r_seq = self.precompute_virtual(params, observations_seq, enabled)
        cf_seq = self.precompute_control_features(params, controls_seq)

        if cf_seq is not None:

            def scan_step(carry, inputs):
                z_t, r_t, cf_t = inputs
                new_belief, mean = self.update_from_virtual(
                    params, carry, z_t, r_t, None, ctrl_feat=cf_t
                )
                return new_belief, mean

            xs = (z_seq, r_seq, cf_seq)
        else:

            def scan_step(carry, inputs):
                z_t, r_t, ctrl_t = inputs
                new_belief, mean = self.update_from_virtual(
                    params, carry, z_t, r_t, ctrl_t
                )
                return new_belief, mean

            xs = (z_seq, r_seq, controls_seq)

        final_belief, estimates = jax.lax.scan(
            scan_step, belief, xs, unroll=self.scan_unroll,
        )
        return final_belief, estimates
