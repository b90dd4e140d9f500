"""Core filter runtime tests: EKF/PF on a synthetic linear-Gaussian system
validated against the closed-form Kalman filter (SURVEY §4 test strategy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalfilter_tpu.filtering import (
    DynamicsDef,
    MeasurementDef,
    ParticleFilterDef,
    VirtualSensorDef,
    VirtualSensorEKFDef,
)
from multimodalfilter_tpu.ops import (
    multinomial_resample,
    soft_resample,
    systematic_resample,
)

STATE_DIM = 2
CONTROL_DIM = 2
OBS_SPEC = (("y", (2,)),)

# Linear-Gaussian system: x' = A x + B u + w, w ~ N(0, Q); y = x + v, v ~ N(0, R)
A = np.array([[0.9, 0.1], [0.0, 0.8]], dtype=np.float32)
B = np.eye(2, dtype=np.float32) * 0.5
Q_DIAG = np.array([0.05, 0.08], dtype=np.float32)
R_DIAG = np.array([0.12, 0.07], dtype=np.float32)


class _LinearDynamicsNet:
    """Duck-typed stand-in for a flax module: known linear dynamics."""

    def init(self, key, states, controls):
        return {"params": {}}

    def apply(self, variables, states, controls):
        new = states @ A.T + controls @ B.T
        tril = jnp.broadcast_to(
            jnp.diag(jnp.sqrt(Q_DIAG)), states.shape[:-1] + (STATE_DIM, STATE_DIM)
        )
        return new, tril


class _LinearVirtualSensorNet:
    def init(self, key, observations):
        return {"params": {}}

    def apply(self, variables, observations):
        y = observations["y"]
        tril = jnp.broadcast_to(
            jnp.diag(jnp.sqrt(R_DIAG)), y.shape[:-1] + (STATE_DIM, STATE_DIM)
        )
        return y, tril


class _GaussianMeasurementNet:
    """Exact Gaussian log-likelihood of y given state (identity observation)."""

    def init(self, key, states, observations):
        return {"params": {}}

    def apply(self, variables, states, observations):
        y = observations["y"][:, None, :]  # (N, 1, D)
        diff = states - y
        log_norm = -0.5 * jnp.sum(jnp.log(2 * jnp.pi * R_DIAG))
        return log_norm - 0.5 * jnp.sum(diff**2 / R_DIAG, axis=-1)


def _simulate(key, timesteps=30, batch=3):
    """Roll out the true system; returns states, obs, controls (T, N, ...)."""
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (batch, STATE_DIM))
    controls = 0.3 * jax.random.normal(ks[1], (timesteps, batch, CONTROL_DIM))
    states, obs = [x], []
    k = ks[2]
    for t in range(timesteps):
        k, kw, kv = jax.random.split(k, 3)
        x = states[-1] @ A.T + controls[t] @ B.T + jnp.sqrt(Q_DIAG) * jax.random.normal(
            kw, (batch, STATE_DIM)
        )
        y = x + jnp.sqrt(R_DIAG) * jax.random.normal(kv, (batch, STATE_DIM))
        states.append(x)
        obs.append(y)
    return jnp.stack(states), jnp.stack(obs), controls


def _closed_form_kf(mean0, cov0, obs, controls):
    """Reference closed-form KF in numpy. The covariance recursion of a
    linear-Gaussian KF is data-independent, so a single (D, D) covariance is
    shared across the batch."""
    mean, cov = np.array(mean0), np.array(cov0[0])
    Q, R = np.diag(Q_DIAG), np.diag(R_DIAG)
    means = []
    for t in range(obs.shape[0]):
        mean = mean @ A.T + np.array(controls[t]) @ B.T
        cov = A @ cov @ A.T + Q
        S = cov + R
        K = cov @ np.linalg.inv(S)
        mean = mean + (np.array(obs[t]) - mean) @ K.T
        cov = (np.eye(STATE_DIM) - K) @ cov
        means.append(mean.copy())
    return np.stack(means)


def _make_ekf():
    return VirtualSensorEKFDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        virtual_sensor_model=VirtualSensorDef(
            _LinearVirtualSensorNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
    )


def test_ekf_matches_closed_form_kf():
    key = jax.random.PRNGKey(0)
    states, obs, controls = _simulate(key)
    ekf = _make_ekf()
    params = ekf.init(key)

    n = states.shape[1]
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (n, STATE_DIM, STATE_DIM))
    belief = ekf.initialize_beliefs(params, key, mean0, cov0, train=False)

    _, estimates = ekf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=False
    )
    expected = _closed_form_kf(mean0, cov0, obs, controls)
    np.testing.assert_allclose(np.array(estimates), expected, rtol=1e-4, atol=1e-4)


def test_ekf_jit_and_grad():
    key = jax.random.PRNGKey(1)
    states, obs, controls = _simulate(key, timesteps=5)
    ekf = _make_ekf()
    params = ekf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (mean0.shape[0], 2, 2))

    @jax.jit
    def loss_fn(mean0):
        belief = ekf.initialize_beliefs(params, key, mean0, cov0, train=True)
        _, est = ekf.forward_loop(params, belief, {"y": obs}, controls, key, train=True)
        return jnp.mean((est - states[1:]) ** 2)

    g = jax.grad(loss_fn)(mean0)
    assert np.all(np.isfinite(np.array(g)))


def test_pf_tracks_near_kf():
    """Bootstrap PF posterior mean should approach the KF posterior mean."""
    key = jax.random.PRNGKey(2)
    states, obs, controls = _simulate(key, timesteps=40, batch=2)
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
        num_particles_eval=2000,
    )
    params = pf.init(key)
    mean0 = states[0]
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))
    belief = pf.initialize_beliefs(params, key, mean0, cov0, train=False)
    _, estimates = pf.forward_loop(
        params, belief, {"y": obs}, controls, key, train=False
    )
    expected = _closed_form_kf(mean0, cov0, obs, controls)
    # Monte-Carlo tolerance; skip a few warmup steps.
    err = np.abs(np.array(estimates[5:]) - expected[5:])
    assert err.mean() < 0.08, err.mean()


def test_pf_train_mode_is_differentiable():
    key = jax.random.PRNGKey(3)
    states, obs, controls = _simulate(key, timesteps=4, batch=2)
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
        obs_spec=OBS_SPEC,
    )
    params = pf.init(key)
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))

    def loss_fn(mean0):
        belief = pf.initialize_beliefs(params, key, mean0, cov0, train=True)
        _, est = pf.forward_loop(params, belief, {"y": obs}, controls, key, train=True)
        return jnp.mean((est - states[1:]) ** 2)

    g = jax.grad(loss_fn)(states[0])
    assert np.all(np.isfinite(np.array(g)))
    assert np.abs(np.array(g)).sum() > 0


@pytest.mark.parametrize(
    "resample_fn",
    [multinomial_resample, systematic_resample],
)
def test_resampling_preserves_mean(resample_fn):
    key = jax.random.PRNGKey(4)
    n, m, d = 2, 4000, 2
    particles = jax.random.normal(key, (n, m, d)) * 2.0
    logits = jax.random.normal(jax.random.PRNGKey(5), (n, m))
    log_w = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)

    new_particles, new_log_w = resample_fn(key, particles, log_w)
    # Weights become uniform.
    np.testing.assert_allclose(
        np.array(new_log_w), -np.log(m) * np.ones((n, m)), rtol=1e-5
    )
    # Weighted mean preserved in expectation.
    before = np.einsum("nm,nmd->nd", np.exp(np.array(log_w)), np.array(particles))
    after = np.array(new_particles).mean(axis=1)
    np.testing.assert_allclose(after, before, atol=0.15)


def test_soft_resample_differentiable_and_mean_preserving():
    key = jax.random.PRNGKey(6)
    n, m, d = 2, 4000, 2
    particles = jax.random.normal(key, (n, m, d))
    logits = 0.5 * jax.random.normal(jax.random.PRNGKey(7), (n, m))

    def weighted_mean_after(logits):
        log_w = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
        p, lw = soft_resample(key, particles, log_w, alpha=0.5)
        return jnp.einsum("nm,nmd->nd", jnp.exp(lw), p)

    log_w = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    before = np.einsum("nm,nmd->nd", np.exp(np.array(log_w)), np.array(particles))
    after = np.array(weighted_mean_after(logits))
    np.testing.assert_allclose(after, before, atol=0.1)

    g = jax.jacrev(lambda lg: weighted_mean_after(lg).sum())(logits)
    assert np.all(np.isfinite(np.array(g)))
    assert np.abs(np.array(g)).sum() > 0


def test_eval_particle_count_switch():
    pf = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            _LinearDynamicsNet(), state_dim=STATE_DIM, control_dim=CONTROL_DIM
        ),
        measurement_model=MeasurementDef(
            _GaussianMeasurementNet(), state_dim=STATE_DIM, obs_spec=OBS_SPEC
        ),
        state_dim=STATE_DIM,
        obs_spec=OBS_SPEC,
    )
    key = jax.random.PRNGKey(0)
    params = pf.init(key)
    mean0 = jnp.zeros((2, STATE_DIM))
    cov0 = jnp.broadcast_to(0.1 * jnp.eye(STATE_DIM), (2, STATE_DIM, STATE_DIM))
    b_train = pf.initialize_beliefs(params, key, mean0, cov0, train=True)
    b_eval = pf.initialize_beliefs(params, key, mean0, cov0, train=False)
    assert b_train.particles.shape == (2, 30, STATE_DIM)
    assert b_eval.particles.shape == (2, 300, STATE_DIM)
