"""Independent numpy oracle for the crossmodal-KF recursion: two linear
virtual-sensor EKFs fused with fixed per-state-dim weights, with the fused
belief written back as both children's prior (the reference's coupling at
crossmodal_kf.py:147-149). Verifies CrossmodalKFDef end-to-end against a
hand-rolled numpy implementation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.filtering import (
    CrossmodalKFDef,
    DynamicsDef,
    VirtualSensorDef,
    VirtualSensorEKFDef,
)

D, C = 2, 2
A = np.array([[0.95, 0.05], [0.0, 0.9]], dtype=np.float32)
B = np.eye(2, dtype=np.float32) * 0.3
Q_DIAG = np.array([0.04, 0.09], dtype=np.float32)
R0_DIAG = np.array([0.10, 0.20], dtype=np.float32)
R1_DIAG = np.array([0.30, 0.05], dtype=np.float32)
WEIGHTS = np.array(
    [[0.7, 0.4], [0.3, 0.6]], dtype=np.float32
)  # (K, D) broadcast over batch
OBS_SPEC = (("y0", (2,)), ("y1", (2,)))


class _LinearDynamics:
    def init(self, key, s, c):
        return {"params": {}}

    def apply(self, variables, states, controls):
        new = states @ A.T + controls @ B.T
        tril = jnp.broadcast_to(
            jnp.diag(jnp.sqrt(Q_DIAG)), states.shape[:-1] + (D, D)
        )
        return new, tril


class _LinearSensor:
    def __init__(self, obs_key, r_diag):
        self.obs_key, self.r_diag = obs_key, r_diag

    def init(self, key, observations):
        return {"params": {}}

    def apply(self, variables, observations):
        y = observations[self.obs_key]
        tril = jnp.broadcast_to(
            jnp.diag(jnp.sqrt(self.r_diag)), y.shape[:-1] + (D, D)
        )
        return y, tril


class _FixedGate:
    """Duck-typed KFWeightDef returning constant (K, N, D) weights."""

    def init(self, key):
        return {}

    def apply(self, params, observations):
        n = observations["y0"].shape[0]
        return jnp.broadcast_to(jnp.asarray(WEIGHTS)[:, None, :], (2, n, D))


def _numpy_oracle(mean0, cov0, obs_seq, controls):
    """Reference recursion in numpy."""
    mean, cov = mean0.copy(), cov0.copy()
    Q = np.diag(Q_DIAG)
    estimates = []
    for t in range(controls.shape[0]):
        # Per-child EKF from the SHARED fused prior.
        child_means, child_covs = [], []
        for obs_key, r_diag in (("y0", R0_DIAG), ("y1", R1_DIAG)):
            pred_mean = mean @ A.T + controls[t] @ B.T
            pred_cov = A @ cov[0] @ A.T + Q  # cov identical across batch here
            S = pred_cov + np.diag(r_diag)
            K = pred_cov @ np.linalg.inv(S)
            child_means.append(pred_mean + (obs_seq[obs_key][t] - pred_mean) @ K.T)
            child_covs.append((np.eye(D) - K) @ pred_cov)
        stacked = np.stack(child_means)  # (K, N, D)
        # Mean: normalized weighted average (weights per state-dim).
        w = WEIGHTS[:, None, :]  # (K, 1, D)
        w_norm = w / (w.sum(axis=0) + 1e-9)
        fused_mean = (w_norm * stacked).sum(axis=0)
        # Cov: sum_k (w w^T) * cov_k with RAW weights.
        fused_cov = np.zeros((D, D), np.float32)
        for k in range(2):
            outer = np.outer(WEIGHTS[k], WEIGHTS[k])
            fused_cov += outer * child_covs[k]
        mean = fused_mean
        cov = np.broadcast_to(fused_cov, cov.shape).copy()
        estimates.append(mean.copy())
    return np.stack(estimates)


def test_crossmodal_kf_matches_numpy_oracle():
    n, t = 3, 6
    rng = np.random.default_rng(0)
    obs_seq = {
        "y0": rng.normal(size=(t, n, D)).astype(np.float32),
        "y1": rng.normal(size=(t, n, D)).astype(np.float32),
    }
    controls = rng.normal(size=(t, n, C)).astype(np.float32)
    mean0 = rng.normal(size=(n, D)).astype(np.float32)
    cov0 = np.broadcast_to(0.2 * np.eye(D, dtype=np.float32), (n, D, D)).copy()

    def child(obs_key, r_diag):
        return VirtualSensorEKFDef(
            dynamics_model=DynamicsDef(_LinearDynamics(), D, C),
            virtual_sensor_model=VirtualSensorDef(
                _LinearSensor(obs_key, r_diag), D, obs_spec=OBS_SPEC
            ),
            state_dim=D,
            control_dim=C,
            obs_spec=OBS_SPEC,
        )

    defn = CrossmodalKFDef(
        filter_models=(child("y0", R0_DIAG), child("y1", R1_DIAG)),
        crossmodal_weight_model=_FixedGate(),
        state_dim=D,
        control_dim=C,
        obs_spec=OBS_SPEC,
    )
    params = defn.init(jax.random.PRNGKey(0))
    belief = defn.initialize_beliefs(
        params, jax.random.PRNGKey(0), jnp.asarray(mean0), jnp.asarray(cov0),
        train=False,
    )
    _, estimates = defn.forward_loop(
        params, belief,
        {k: jnp.asarray(v) for k, v in obs_seq.items()}, jnp.asarray(controls),
        jax.random.PRNGKey(1), train=False,
    )

    expected = _numpy_oracle(mean0, cov0, obs_seq, controls)
    np.testing.assert_allclose(
        np.asarray(estimates), expected, rtol=2e-4, atol=2e-5
    )


def test_crossmodal_kf_oracle_blackout_gate():
    """With know_image_blackout and an all-zero 'image', weights collapse to
    (1e-9, 1-1e-9) — the fused estimate must equal the force child's."""
    n = 2
    rng = np.random.default_rng(1)
    obs = {
        "y0": rng.normal(size=(n, D)).astype(np.float32),
        "y1": rng.normal(size=(n, D)).astype(np.float32),
        "image": np.zeros((n, 4, 4), np.float32),
    }
    controls = rng.normal(size=(n, C)).astype(np.float32)
    mean0 = rng.normal(size=(n, D)).astype(np.float32)
    cov0 = np.broadcast_to(0.2 * np.eye(D, dtype=np.float32), (n, D, D)).copy()
    spec = OBS_SPEC + (("image", (4, 4)),)

    def child(obs_key, r_diag):
        return VirtualSensorEKFDef(
            dynamics_model=DynamicsDef(_LinearDynamics(), D, C),
            virtual_sensor_model=VirtualSensorDef(
                _LinearSensor(obs_key, r_diag), D, obs_spec=spec
            ),
            state_dim=D, control_dim=C, obs_spec=spec,
        )

    children = (child("y0", R0_DIAG), child("y1", R1_DIAG))
    defn = CrossmodalKFDef(
        filter_models=children,
        crossmodal_weight_model=_FixedGate(),
        state_dim=D, control_dim=C, obs_spec=spec, know_image_blackout=True,
    )
    params = defn.init(jax.random.PRNGKey(0))
    belief = defn.initialize_beliefs(
        params, jax.random.PRNGKey(0), jnp.asarray(mean0), jnp.asarray(cov0),
        train=False,
    )
    _, est = defn.step(
        params, belief, {k: jnp.asarray(v) for k, v in obs.items()},
        jnp.asarray(controls), None, train=False,
    )

    # Force child alone from the same prior.
    _, force_est = children[1].step(
        params["filter_models"]["1"], belief,
        {k: jnp.asarray(v) for k, v in obs.items()}, jnp.asarray(controls),
        None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(est), np.asarray(force_est), rtol=1e-5, atol=1e-6
    )
